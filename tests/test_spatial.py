"""Spatial-parallel (halo exchange) and tiled-inference tests (CPU mesh)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from downgan_tpu.config.config import Config, HyperParams
from downgan_tpu.parallel.mesh import make_mesh
from downgan_tpu.parallel.spatial import make_sharded_conv, tiled_sr_inference
from downgan_tpu.training.state import make_models


def reference_conv(x, kernel, bias):
    from jax import lax

    dn = lax.conv_dimension_numbers(x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(
        x, kernel, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn
    ) + bias


def test_sharded_conv_matches_unsharded():
    """H-sharded halo-exchange conv == plain SAME conv, exactly."""
    mesh = make_mesh(axes=("spatial",))
    n = mesh.devices.size
    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    x = jax.random.normal(k1, (2, 8 * n, 12, 5))
    kernel = jax.random.normal(k2, (3, 3, 5, 7)) * 0.1
    bias = jax.random.normal(k3, (7,)) * 0.1

    want = reference_conv(x, kernel, bias)
    conv = make_sharded_conv(mesh)
    got = conv(x, kernel, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_sharded_conv_single_device_mesh():
    mesh = make_mesh((1,), ("spatial",), devices=jax.devices()[:1])
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 3))
    kernel = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, 4)) * 0.1
    bias = jnp.zeros((4,))
    got = make_sharded_conv(mesh)(x, kernel, bias)
    want = reference_conv(x, kernel, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_tiled_sr_inference_matches_full_interior():
    """Overlap-tiled inference over a tall domain: interior rows match
    whole-field inference; seams are numerically invisible at 8-row
    overlap for a 1-RRDB generator."""
    config = Config(coarse_size=16, fine_size=128, filters=8, num_res_blocks=1,
                    hp=HyperParams(batch_size=2))
    gen, _ = make_models(config)
    coarse = np.random.default_rng(0).standard_normal((1, 48, 16, 7)).astype(np.float32)
    params = gen.init(jax.random.PRNGKey(0), jnp.asarray(coarse[:, :16]))

    full = np.asarray(jax.jit(gen.apply)(params, jnp.asarray(coarse)))
    tiled = tiled_sr_inference(config, params, coarse, tile_rows=16, overlap=8)
    assert tiled.shape == full.shape
    err = np.abs(tiled - full)
    assert err.max() < 5e-2, err.max()
    # seam error decays as the overlap margin grows toward the receptive field
    err4 = np.abs(tiled_sr_inference(config, params, coarse, 16, 4) - full).max()
    err16 = np.abs(tiled_sr_inference(config, params, coarse, 16, 16) - full).max()
    assert err16 < err.max() < err4, (err4, err.max(), err16)


def test_sharded_generator_matches_unsharded():
    """Every conv halo-exchanged: H-sharded generator forward is exact."""
    import jax.numpy as jnp

    from downgan_tpu.parallel.spatial import sharded_generator_apply
    from downgan_tpu.training.state import create_state

    config = Config(coarse_size=16, fine_size=128, filters=8, num_res_blocks=1,
                    hp=HyperParams(batch_size=2))
    gen, _ = make_models(config)
    state = create_state(config, jax.random.PRNGKey(0))
    # H = 16 rows over 8 devices -> 2 coarse rows per shard.
    coarse = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 7))

    want = jax.jit(gen.apply)(state.g_params, coarse)
    mesh = make_mesh(axes=("spatial",))
    apply = sharded_generator_apply(config, mesh)
    got = apply(state.g_params, coarse)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
