"""Training-dynamics parity vs a torch replica of the reference update.

The strongest parity claim: starting from identical (ported) weights and
identical batches, the full WGAN-GP update pipeline — critic loss with the
reference's doubled gp_lambda, nested-grad gradient penalty, generator
loss, backprop, optimizer step — produces the same parameter trajectory as
the reference semantics executed in torch (``DoWnGAN/GAN/wasserstein.py:
27-83``, replicated here rather than imported since the reference trainer
module drags in mlflow).

SGD is used for the trajectory legs (Adam's first-step update is
sign(g)-like, so fp-level gradient noise flips near-zero coordinates by
±lr — that would test luck, not parity); Adam itself is pinned separately
against torch.optim.Adam on controlled gradients.
"""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "DoWnGAN")),
    reason="reference checkout not available",
)
if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

GP_LAMBDA, GAMMA, CONTENT_LAMBDA, LR = 10.0, 0.01, 5.0, 1e-4


def _torch_gp(critic, real, fake, alpha):
    interp = (alpha * real + (1 - alpha) * fake).requires_grad_(True)
    score = critic(interp)
    grads = torch.autograd.grad(
        score, interp, grad_outputs=torch.ones_like(score), create_graph=True
    )[0]
    norms = torch.sqrt(torch.sum(grads.view(real.shape[0], -1) ** 2, dim=1) + 1e-12)
    return GP_LAMBDA * ((norms - 1.0) ** 2).mean()


def test_full_update_trajectory_parity_sgd():
    from DoWnGAN.networks.critic import Critic as TorchCritic
    from DoWnGAN.networks.generator import Generator as TorchGen

    import jax
    import jax.numpy as jnp
    import optax

    from downgan_tpu.config.config import Config, HyperParams
    from downgan_tpu.models.critic import Critic
    from downgan_tpu.models.generator import Generator
    from downgan_tpu.training.wgan import make_loss_fns
    from downgan_tpu.utils.port_weights import port_critic, port_generator

    filters, coarse_hw, fine_hw, blocks = 8, 8, 64, 1
    torch.manual_seed(0)
    tg = TorchGen(filters, fine_hw, 7, 2, num_res_blocks=blocks)
    tc = TorchCritic(filters, fine_hw, 2)
    g_params = port_generator(
        {k: v.detach().numpy() for k, v in tg.state_dict().items()},
        num_res_blocks=blocks, num_upsample=3,
    )
    c_params = port_critic(
        {k: v.detach().numpy() for k, v in tc.state_dict().items()},
        base=filters, fine_size=fine_hw,
    )

    config = Config(coarse_size=coarse_hw, fine_size=fine_hw, filters=filters,
                    num_res_blocks=blocks,
                    hp=HyperParams(gp_lambda=GP_LAMBDA, gamma=GAMMA,
                                   content_lambda=CONTENT_LAMBDA, lr=LR))
    gen = Generator(filters=filters, n_predictands=2, num_res_blocks=blocks)
    critic = Critic(base=filters, fine_size=fine_hw)
    _, critic_loss_fn, gen_loss_fn = make_loss_fns(config, gen, critic)
    tx = optax.sgd(LR)
    g_opt = tx.init(g_params)
    c_opt = tx.init(c_params)

    g_optim_t = torch.optim.SGD(tg.parameters(), lr=LR)
    c_optim_t = torch.optim.SGD(tc.parameters(), lr=LR)

    rng = np.random.default_rng(0)
    to_nhwc = lambda x: jnp.asarray(np.transpose(x, (0, 2, 3, 1)))

    @jax.jit
    def critic_step(c_params, c_opt, g_params, coarse, fine, alpha):
        fake = jax.lax.stop_gradient(gen.apply(g_params, coarse))
        grads = jax.grad(
            lambda cp: critic_loss_fn(cp, fake, fine, alpha)[0]
        )(c_params)
        updates, c_opt = tx.update(grads, c_opt, c_params)
        return optax.apply_updates(c_params, updates), c_opt

    @jax.jit
    def gen_step(g_params, g_opt, c_params, coarse, fine):
        grads = jax.grad(gen_loss_fn)(g_params, c_params, coarse, fine)
        updates, g_opt = tx.update(grads, g_opt, g_params)
        return optax.apply_updates(g_params, updates), g_opt

    for step in range(3):
        coarse = rng.standard_normal((2, 7, coarse_hw, coarse_hw)).astype(np.float32)
        fine = rng.standard_normal((2, 2, fine_hw, fine_hw)).astype(np.float32)
        alpha = rng.uniform(size=(2, 1, 1, 1)).astype(np.float32)

        # ---- torch replica of the reference critic iteration
        coarse_t, fine_t = torch.from_numpy(coarse), torch.from_numpy(fine)
        fake_t = tg(coarse_t).detach()
        c_optim_t.zero_grad()
        loss_t = (tc(fake_t).mean() - tc(fine_t).mean()
                  + GP_LAMBDA * _torch_gp(tc, fine_t, fake_t, torch.from_numpy(alpha)))
        loss_t.backward()
        c_optim_t.step()

        c_params, c_opt = critic_step(
            c_params, c_opt, g_params, to_nhwc(coarse), to_nhwc(fine), jnp.asarray(alpha)
        )

        # ---- torch replica of the reference generator iteration
        g_optim_t.zero_grad()
        fake_t = tg(coarse_t)
        g_loss_t = (-tc(fake_t).mean() * GAMMA
                    + CONTENT_LAMBDA * torch.mean(torch.abs(fake_t - fine_t)))
        g_loss_t.backward()
        g_optim_t.step()

        g_params, g_opt = gen_step(g_params, g_opt, c_params, to_nhwc(coarse), to_nhwc(fine))

    # ---- trajectories agree after 3 full rounds
    want_g = port_generator(
        {k: v.detach().numpy() for k, v in tg.state_dict().items()},
        num_res_blocks=blocks, num_upsample=3,
    )
    want_c = port_critic(
        {k: v.detach().numpy() for k, v in tc.state_dict().items()},
        base=filters, fine_size=fine_hw,
    )
    for ours, want in ((g_params, want_g), (c_params, want_c)):
        for a, b in zip(jax.tree.leaves(ours), jax.tree.leaves(want)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_adam_matches_torch_adam():
    """optax.adam(lr, b1=.9, b2=.99, eps=1e-8) == torch.optim.Adam on a
    controlled gradient sequence (reference stage.py:63-64 settings)."""
    import jax.numpy as jnp
    import optax

    rng = np.random.default_rng(1)
    param0 = rng.standard_normal(64).astype(np.float32)
    grads = [rng.standard_normal(64).astype(np.float32) for _ in range(5)]

    p_t = torch.nn.Parameter(torch.from_numpy(param0.copy()))
    opt_t = torch.optim.Adam([p_t], lr=2.5e-4, betas=(0.9, 0.99), eps=1e-8)
    for g in grads:
        opt_t.zero_grad()
        p_t.grad = torch.from_numpy(g.copy())
        opt_t.step()

    tx = optax.adam(2.5e-4, b1=0.9, b2=0.99, eps=1e-8)
    p_j = jnp.asarray(param0)
    state = tx.init(p_j)
    for g in grads:
        updates, state = tx.update(jnp.asarray(g), state, p_j)
        p_j = optax.apply_updates(p_j, updates)

    np.testing.assert_allclose(
        np.asarray(p_j), p_t.detach().numpy(), atol=1e-7, rtol=1e-6
    )
