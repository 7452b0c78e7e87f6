"""Numerical parity harness against the reference PyTorch networks.

Imports the reference modules from /root/reference (read-only), ports
randomly-initialized torch weights into the flax models via
``downgan_tpu.utils.port_weights``, and asserts forward-pass equivalence
in fp32 on CPU — the "bit-comparable RMSE" leg of BASELINE.md. Skipped
when torch or the reference checkout is unavailable.
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


@pytest.fixture(scope="module")
def small_dims():
    # Small florida-like workload keeps the CPU runtime reasonable while
    # exercising every layer type: 2 RRDBs, 8x upsample, full critic.
    return dict(filters=8, coarse=8, fine=64, n_cov=7, n_pred=2, blocks=2)


def test_generator_forward_parity(small_dims):
    from DoWnGAN.networks.generator import Generator as TorchGen

    import jax.numpy as jnp

    from downgan_tpu.models.generator import Generator
    from downgan_tpu.utils.port_weights import port_generator

    d = small_dims
    torch.manual_seed(0)
    tg = TorchGen(d["filters"], d["fine"], d["n_cov"], d["n_pred"],
                  num_res_blocks=d["blocks"]).eval()
    sd = {k: v.detach().numpy() for k, v in tg.state_dict().items()}

    fg = Generator(filters=d["filters"], n_predictands=d["n_pred"],
                   num_res_blocks=d["blocks"], num_upsample=3)
    params = port_generator(sd, num_res_blocks=d["blocks"], num_upsample=3)

    x = np.random.default_rng(0).standard_normal(
        (2, d["n_cov"], d["coarse"], d["coarse"])).astype(np.float32)
    with torch.no_grad():
        ref = tg(torch.from_numpy(x)).numpy()
    ours = np.asarray(fg.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, atol=2e-5, rtol=1e-5)


def test_critic_forward_parity(small_dims):
    from DoWnGAN.networks.critic import Critic as TorchCritic

    import jax.numpy as jnp

    from downgan_tpu.models.critic import Critic
    from downgan_tpu.utils.port_weights import port_critic

    d = small_dims
    torch.manual_seed(1)
    tc = TorchCritic(d["filters"], d["fine"], d["n_pred"]).eval()
    sd = {k: v.detach().numpy() for k, v in tc.state_dict().items()}

    fc = Critic(base=d["filters"], fine_size=d["fine"])
    params = port_critic(sd, base=d["filters"], fine_size=d["fine"])

    x = np.random.default_rng(1).standard_normal(
        (4, d["n_pred"], d["fine"], d["fine"])).astype(np.float32)
    with torch.no_grad():
        ref = tc(torch.from_numpy(x)).numpy()
    ours = np.asarray(fc.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=1e-4)


def test_param_counts_match_reference_florida():
    """Full florida workload: parameter-count parity (SURVEY header:
    G=1,696,514 / C=1,112,313)."""
    import jax

    from downgan_tpu.config.config import Config
    from downgan_tpu.training.state import create_state, param_count

    config = Config()
    state = create_state(config, jax.random.PRNGKey(0))
    assert param_count(state.g_params) == 1_696_514
    assert param_count(state.c_params) == 1_112_313


def test_generator_gradient_parity(small_dims):
    """Gradients through both implementations agree (content-loss grad wrt
    a shared leaf) — catches layout-mapping errors the forward test can
    mask (e.g. transposed-but-symmetric kernels)."""
    from DoWnGAN.networks.generator import Generator as TorchGen

    import jax
    import jax.numpy as jnp

    from downgan_tpu.models.generator import Generator
    from downgan_tpu.utils.port_weights import port_generator

    d = small_dims
    torch.manual_seed(2)
    tg = TorchGen(d["filters"], d["fine"], d["n_cov"], d["n_pred"],
                  num_res_blocks=d["blocks"])
    sd = {k: v.detach().numpy() for k, v in tg.state_dict().items()}
    fg = Generator(filters=d["filters"], n_predictands=d["n_pred"],
                   num_res_blocks=d["blocks"], num_upsample=3)
    params = port_generator(sd, num_res_blocks=d["blocks"], num_upsample=3)

    x_np = np.random.default_rng(2).standard_normal(
        (2, d["n_cov"], d["coarse"], d["coarse"])).astype(np.float32)

    out = tg(torch.from_numpy(x_np))
    out.abs().mean().backward()
    ref_grad = tg.conv1.weight.grad.detach().numpy()  # OIHW

    def loss(p):
        y = fg.apply(p, jnp.asarray(x_np.transpose(0, 2, 3, 1)))
        return jnp.mean(jnp.abs(y))

    grads = jax.grad(loss)(params)
    ours = np.asarray(grads["params"]["conv1"]["Conv_0"]["kernel"])  # HWIO
    np.testing.assert_allclose(
        ours.transpose(3, 2, 0, 1), ref_grad, atol=1e-5, rtol=1e-4
    )


def test_gradient_penalty_parity_with_torch(small_dims):
    """The GP double backward (SURVEY §7 'hard parts'): same ported critic,
    same interpolation, same eps guard — torch autograd.grad vs nested
    jax.grad must agree on the penalty value AND its critic-weight
    gradient."""
    from DoWnGAN.networks.critic import Critic as TorchCritic

    import jax
    import jax.numpy as jnp

    from downgan_tpu.models.critic import Critic
    from downgan_tpu.training.wgan import gradient_penalty
    from downgan_tpu.utils.port_weights import port_critic

    d = small_dims
    torch.manual_seed(3)
    tc = TorchCritic(d["filters"], d["fine"], d["n_pred"])
    sd = {k: v.detach().numpy() for k, v in tc.state_dict().items()}
    fc = Critic(base=d["filters"], fine_size=d["fine"])
    params = port_critic(sd, base=d["filters"], fine_size=d["fine"])

    rng = np.random.default_rng(3)
    b = 4
    real = rng.standard_normal((b, d["n_pred"], d["fine"], d["fine"])).astype(np.float32)
    fake = (real * 0.7 + 0.3 * rng.standard_normal(real.shape)).astype(np.float32)
    alpha = rng.uniform(size=(b, 1, 1, 1)).astype(np.float32)

    # --- torch double backward (reference wasserstein.py:87-117 semantics)
    real_t = torch.from_numpy(real)
    fake_t = torch.from_numpy(fake)
    alpha_t = torch.from_numpy(alpha)
    interp = (alpha_t * real_t + (1 - alpha_t) * fake_t).requires_grad_(True)
    score = tc(interp)
    grads = torch.autograd.grad(
        score, interp, grad_outputs=torch.ones_like(score), create_graph=True
    )[0]
    norms = torch.sqrt(torch.sum(grads.view(b, -1) ** 2, dim=1) + 1e-12)
    gp_t = ((norms - 1.0) ** 2).mean()
    gp_t.backward()
    ref_gp = float(gp_t.detach())
    ref_wgrad = tc.features[0].weight.grad.detach().numpy()  # OIHW

    # --- jax nested grad on NHWC
    to_nhwc = lambda x: jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    gp_fn = lambda cp: gradient_penalty(
        fc.apply, cp, to_nhwc(real), to_nhwc(fake), jnp.asarray(alpha)
    )
    ours_gp = float(gp_fn(params))
    wgrad = jax.grad(gp_fn)(params)["params"]["conv0"]["Conv_0"]["kernel"]

    assert ours_gp == pytest.approx(ref_gp, rel=1e-4)
    np.testing.assert_allclose(
        np.asarray(wgrad).transpose(3, 2, 0, 1), ref_wgrad, atol=2e-5, rtol=1e-3
    )


def test_rmse_and_ralsd_parity(small_dims):
    """BASELINE metric leg: fields generated by the ported flax generator
    match the torch reference within fp32 tolerance -> RMSE ~ 0 and RALSD
    between the two outputs ~ 0 dB."""
    from DoWnGAN.networks.generator import Generator as TorchGen

    import jax.numpy as jnp

    from downgan_tpu.models.generator import Generator
    from downgan_tpu.ops.spectral import ralsd
    from downgan_tpu.utils.port_weights import port_generator

    d = small_dims
    torch.manual_seed(4)
    tg = TorchGen(d["filters"], d["fine"], d["n_cov"], d["n_pred"],
                  num_res_blocks=d["blocks"]).eval()
    sd = {k: v.detach().numpy() for k, v in tg.state_dict().items()}
    fg = Generator(filters=d["filters"], n_predictands=d["n_pred"],
                   num_res_blocks=d["blocks"], num_upsample=3)
    params = port_generator(sd, num_res_blocks=d["blocks"], num_upsample=3)

    x = np.random.default_rng(4).standard_normal(
        (4, d["n_cov"], d["coarse"], d["coarse"])).astype(np.float32)
    with torch.no_grad():
        ref = tg(torch.from_numpy(x)).numpy()
    ours = np.asarray(fg.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1))))

    rmse = float(np.sqrt(np.mean((ours.transpose(0, 3, 1, 2) - ref) ** 2)))
    assert rmse < 1e-5, rmse
    ralsd_db = float(ralsd(jnp.asarray(ours),
                           jnp.asarray(ref.transpose(0, 2, 3, 1))))
    assert ralsd_db < 1e-3, ralsd_db


def test_export_roundtrip(small_dims):
    """export_* inverts port_*: torch -> flax -> torch is the identity, and
    the exported dict loads back into the reference nets."""
    from DoWnGAN.networks.critic import Critic as TorchCritic
    from DoWnGAN.networks.generator import Generator as TorchGen

    from downgan_tpu.utils.port_weights import (
        export_critic,
        export_generator,
        port_critic,
        port_generator,
    )

    d = small_dims
    torch.manual_seed(7)
    tg = TorchGen(d["filters"], d["fine"], d["n_cov"], d["n_pred"],
                  num_res_blocks=d["blocks"])
    tc = TorchCritic(d["filters"], d["fine"], d["n_pred"])
    g_sd = {k: v.detach().numpy() for k, v in tg.state_dict().items()}
    c_sd = {k: v.detach().numpy() for k, v in tc.state_dict().items()}

    g_back = export_generator(port_generator(g_sd, d["blocks"], 3), d["blocks"], 3)
    assert set(g_back) == set(g_sd)
    for k in g_sd:
        np.testing.assert_array_equal(g_back[k], g_sd[k])

    c_back = export_critic(port_critic(c_sd, d["filters"], d["fine"]),
                           d["filters"], d["fine"])
    assert set(c_back) == set(c_sd)
    for k in c_sd:
        np.testing.assert_array_equal(c_back[k], c_sd[k])

    # loads back into the reference modules without complaint
    tg.load_state_dict({k: torch.from_numpy(np.array(v)) for k, v in g_back.items()})
    tc.load_state_dict({k: torch.from_numpy(np.array(v)) for k, v in c_back.items()})
