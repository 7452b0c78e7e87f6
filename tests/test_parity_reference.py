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
