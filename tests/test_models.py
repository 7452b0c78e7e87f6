"""Model tests: parameter counts pinned to the reference's verified sizes,
forward shapes, pixel-shuffle semantics vs torch, stride-2 padding parity.
(Reference sizes verified by execution: SURVEY §0 — G 1,696,514 / C 1,112,313.)
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from downgan_tpu.models import Critic, Generator
from downgan_tpu.models.layers import nchw_to_nhwc, nhwc_to_nchw, pixel_shuffle, space_to_depth
from downgan_tpu.training.state import param_count


@pytest.fixture(scope="module")
def gen_params():
    gen = Generator(filters=16, n_predictands=2, num_res_blocks=16, num_upsample=3)
    params = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 7)))
    return gen, params


@pytest.fixture(scope="module")
def critic_params():
    critic = Critic(base=16, fine_size=128)
    params = critic.init(jax.random.PRNGKey(1), jnp.zeros((1, 128, 128, 2)))
    return critic, params


def test_generator_param_count(gen_params):
    _, params = gen_params
    assert param_count(params) == 1_696_514


def test_critic_param_count(critic_params):
    _, params = critic_params
    assert param_count(params) == 1_112_313


def test_generator_forward_shape(gen_params):
    gen, params = gen_params
    out = gen.apply(params, jnp.zeros((3, 16, 16, 7)))
    assert out.shape == (3, 128, 128, 2)
    assert out.dtype == jnp.float32


def test_critic_forward_shape(critic_params):
    critic, params = critic_params
    out = critic.apply(params, jnp.zeros((3, 128, 128, 2)))
    assert out.shape == (3, 1)


def test_generator_jit_and_grad(gen_params):
    gen, params = gen_params
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 7))

    @jax.jit
    def loss(p):
        return jnp.mean(gen.apply(p, x) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert all(jnp.all(jnp.isfinite(leaf)) for leaf in leaves)
    # Every parameter should receive gradient signal.
    assert sum(float(jnp.sum(jnp.abs(leaf))) for leaf in leaves) > 0


def test_pixel_shuffle_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.random.RandomState(0).randn(2, 8, 5, 6).astype(np.float32)  # NCHW, C=8
    ref = torch.nn.functional.pixel_shuffle(torch.from_numpy(x), 2).numpy()
    ours = nhwc_to_nchw(pixel_shuffle(nchw_to_nhwc(jnp.asarray(x)), 2))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-6)


def test_space_to_depth_inverts_pixel_shuffle():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 6, 12))
    y = space_to_depth(pixel_shuffle(x, 2), 2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-6)


def test_stride2_conv_padding_matches_torch(critic_params):
    """Explicit ((1,1),(1,1)) padding must reproduce torch Conv2d(padding=1)
    at stride 2 on even inputs (XLA 'SAME' would not)."""
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(1)
    x = rng.randn(1, 3, 8, 8).astype(np.float32)
    w = rng.randn(5, 3, 3, 3).astype(np.float32)

    ref = torch.nn.functional.conv2d(
        torch.from_numpy(x), torch.from_numpy(w), stride=2, padding=1
    ).numpy()

    out = jax.lax.conv_general_dilated(
        nchw_to_nhwc(jnp.asarray(x)),
        jnp.asarray(w).transpose(2, 3, 1, 0),  # OIHW -> HWIO
        window_strides=(2, 2),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(nhwc_to_nchw(out)), ref, rtol=1e-4, atol=1e-5)


def test_generator_bf16_path():
    gen = Generator(filters=16, n_predictands=2, num_res_blocks=2, num_upsample=3, dtype=jnp.bfloat16)
    params = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 7)))
    out = gen.apply(params, jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 7)))
    assert out.shape == (2, 128, 128, 2)
    assert out.dtype == jnp.float32  # params f32, compute bf16, output f32
    assert bool(jnp.all(jnp.isfinite(out)))


def test_remat_generator_matches_and_backprops():
    """hp.remat rematerializes RRDB activations: identical outputs and
    gradients, lower peak activation memory (not measurable on CPU — we
    pin numerics)."""
    import jax
    import jax.numpy as jnp

    from downgan_tpu.config.config import Config, HyperParams
    from downgan_tpu.training.state import create_state, make_models

    base = Config(coarse_size=8, fine_size=32, filters=8, num_res_blocks=2,
                  hp=HyperParams(batch_size=2))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 7))

    outs, grads = {}, {}
    for flag in (False, True):
        config = base.replace(hp=HyperParams(batch_size=2, remat=flag))
        gen, _ = make_models(config)
        state = create_state(config, jax.random.PRNGKey(0))
        outs[flag] = gen.apply(state.g_params, x)
        g = jax.grad(lambda p: jnp.sum(jnp.abs(gen.apply(p, x))))(state.g_params)
        grads[flag] = jax.tree.leaves(g)[0]
    np.testing.assert_allclose(np.asarray(outs[False]), np.asarray(outs[True]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(grads[False]), np.asarray(grads[True]), atol=1e-6)


def test_config_num_upsample_validates_sizes():
    """fine_size must be coarse_size times a power of two — floor division
    used to let e.g. 192/128 pass as ratio 1 and silently build a
    generator with the wrong output size."""
    import pytest

    from downgan_tpu.config.config import Config

    assert Config(coarse_size=16, fine_size=128).num_upsample == 3
    assert Config(coarse_size=16, fine_size=16).num_upsample == 0
    for coarse, fine in ((128, 192), (16, 48), (16, 8)):
        with pytest.raises(ValueError, match="power of two"):
            _ = Config(coarse_size=coarse, fine_size=fine).num_upsample
