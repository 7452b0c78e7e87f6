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


def test_tiled_sr_inference_2d_tiles():
    """Lon tiling too: a wide+tall domain tiled in both axes matches the
    whole-field forward to seam tolerance, for any tiles_per_dispatch."""
    config = Config(coarse_size=16, fine_size=128, filters=8, num_res_blocks=1,
                    hp=HyperParams(batch_size=2))
    gen, _ = make_models(config)
    coarse = np.random.default_rng(1).standard_normal((2, 40, 44, 7)).astype(np.float32)
    params = gen.init(jax.random.PRNGKey(0), jnp.asarray(coarse[:, :16, :16]))

    full = np.asarray(jax.jit(gen.apply)(params, jnp.asarray(coarse)))
    tiled = tiled_sr_inference(config, params, coarse, tile_rows=16, overlap=8,
                               tile_cols=12, tiles_per_dispatch=5)
    assert tiled.shape == full.shape
    assert np.abs(tiled - full).max() < 5e-2
    # dispatch chunking is purely a batching detail: bit-identical results
    again = tiled_sr_inference(config, params, coarse, tile_rows=16, overlap=8,
                               tile_cols=12, tiles_per_dispatch=3)
    np.testing.assert_array_equal(tiled, again)


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


def test_sharded_critic_matches_unsharded():
    """H-sharded critic (halo convs + row-parallel classifier) is exact,
    and the GP double-grad flows through the collectives."""
    import jax.numpy as jnp

    from downgan_tpu.parallel.spatial import sharded_critic_apply
    from downgan_tpu.training.state import create_state
    from downgan_tpu.training.wgan import gradient_penalty

    config = Config(coarse_size=16, fine_size=128, filters=8, num_res_blocks=1,
                    hp=HyperParams(batch_size=2))
    _, critic = make_models(config)
    state = create_state(config, jax.random.PRNGKey(0))
    fine = jax.random.normal(jax.random.PRNGKey(1), (2, 128, 128, 2))

    want = jax.jit(critic.apply)(state.c_params, fine)
    mesh = make_mesh(axes=("spatial",))
    apply = sharded_critic_apply(config, mesh)
    got = apply(state.c_params, fine)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-4, rtol=1e-4)

    # gradient penalty through the sharded critic == through the plain one
    fake = fine * 0.9
    alpha = jnp.full((2, 1, 1, 1), 0.3)
    gp_plain = float(gradient_penalty(critic.apply, state.c_params, fine, fake, alpha))
    gp_shard = float(gradient_penalty(
        lambda p, x: apply(p, x), state.c_params, fine, fake, alpha))
    assert gp_shard == pytest.approx(gp_plain, rel=1e-3)


def test_spatial_train_step_matches_plain():
    """Model-parallel (field-sharded) train step produces the same updated
    params as the plain single-device step."""
    from downgan_tpu.parallel.spatial import build_spatial_train_step
    from downgan_tpu.training.state import create_state
    from downgan_tpu.training.wgan import build_train_step

    hp = HyperParams(batch_size=2, metrics_to_calculate=("MAE", "MSE", "Wass"))
    config = Config(coarse_size=16, fine_size=128, filters=8, num_res_blocks=1, hp=hp)
    gen, critic = make_models(config)
    rng = jax.random.PRNGKey(5)
    coarse = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 7))
    fine = jax.random.normal(jax.random.PRNGKey(2), (2, 128, 128, 2))

    plain = jax.jit(build_train_step(config, gen, critic, with_metrics=False))
    s1, m1 = plain(create_state(config, jax.random.PRNGKey(0)), coarse, fine, rng)

    mesh = make_mesh(axes=("spatial",))
    spatial = build_spatial_train_step(config, mesh)
    s2, m2 = spatial(create_state(config, jax.random.PRNGKey(0)), coarse, fine, rng)

    assert float(m1["critic_loss"]) == pytest.approx(float(m2["critic_loss"]), rel=1e-3)
    for a, b in zip(jax.tree.leaves(s1.c_params), jax.tree.leaves(s2.c_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)
    for a, b in zip(jax.tree.leaves(s1.g_params), jax.tree.leaves(s2.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_spatial_train_step_composes_with_noise_and_flips():
    """Round-3 stochastic/augmentation features compose with the
    spatially-sharded step: the latent injection and the flip draws both
    happen OUTSIDE the shard_map (on the replicated rng, applied to the
    auto-sharded batch), so a noise_channels>0 + augment_flips step must
    produce the same losses/metrics field-sharded as on one device."""
    from downgan_tpu.parallel.spatial import build_spatial_train_step
    from downgan_tpu.training.state import create_state
    from downgan_tpu.training.wgan import build_train_step

    hp = HyperParams(batch_size=2, augment_flips=True,
                     metrics_to_calculate=("MAE", "MSE", "Wass"))
    config = Config(coarse_size=16, fine_size=128, filters=8,
                    num_res_blocks=1, noise_channels=2, hp=hp)
    gen, critic = make_models(config)
    rng = jax.random.PRNGKey(7)
    coarse = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 7))
    fine = jax.random.normal(jax.random.PRNGKey(2), (2, 128, 128, 2))

    plain = jax.jit(build_train_step(config, gen, critic, with_metrics=True))
    s1, m1 = plain(create_state(config, jax.random.PRNGKey(0)), coarse, fine, rng)

    mesh = make_mesh(axes=("spatial",))
    spatial = build_spatial_train_step(config, mesh, with_metrics=True)
    s2, m2 = spatial(create_state(config, jax.random.PRNGKey(0)), coarse, fine, rng)

    for k in m1:
        assert float(jnp.mean(m1[k])) == pytest.approx(
            float(jnp.mean(m2[k])), rel=1e-4), k
    for a, b in zip(jax.tree.leaves(s1.c_params), jax.tree.leaves(s2.c_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_dp_spatial_composed_step_matches_dp():
    """DP x SP in one step: batch sharded over a 4-way data axis AND
    fields halo-sharded over a 2-way spatial axis (4x2 mesh) produce the
    same update as the DP-only step with the SAME 4-way batch sharding —
    isolating the spatial decomposition (the DP-vs-single-device
    equivalence is test_parallel's job; comparing composed vs PLAIN
    would conflate the batch psum order, whose ulp-level grad deltas
    Adam's step-1 sign normalization amplifies to ~2*lr on near-zero
    gradients). Metrics still cross-check against the plain step."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from downgan_tpu.parallel.dp import build_dp_train_step
    from downgan_tpu.parallel.spatial import build_dp_spatial_train_step
    from downgan_tpu.training.state import create_state
    from downgan_tpu.training.wgan import build_train_step

    hp = HyperParams(batch_size=8, metrics_to_calculate=("MAE", "MSE", "Wass"))
    config = Config(coarse_size=16, fine_size=128, filters=8, num_res_blocks=1, hp=hp)
    gen, critic = make_models(config)
    rng = jax.random.PRNGKey(5)
    coarse = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 16, 7))
    fine = jax.random.normal(jax.random.PRNGKey(2), (8, 128, 128, 2))

    plain = jax.jit(build_train_step(config, gen, critic, with_metrics=True))
    _, m0 = plain(create_state(config, jax.random.PRNGKey(0)), coarse, fine, rng)

    # DP-only baseline: batch over a 4-way data axis (spatial unsharded)
    mesh_dp = make_mesh((4,), ("data",), devices=jax.devices()[:4])
    dp = build_dp_train_step(config, gen, critic, mesh_dp, with_metrics=True,
                             donate_state=False)
    bat_dp = NamedSharding(mesh_dp, P("data", None, None, None))
    s1, m1 = dp(
        jax.device_put(create_state(config, jax.random.PRNGKey(0)),
                       NamedSharding(mesh_dp, P())),
        jax.device_put(coarse, bat_dp), jax.device_put(fine, bat_dp), rng)

    mesh = make_mesh((4, 2), ("data", "spatial"))
    step2d = build_dp_spatial_train_step(config, mesh, with_metrics=True,
                                         donate_state=False)
    bat = NamedSharding(mesh, P("data", "spatial", None, None))
    s2, m2 = step2d(
        jax.device_put(create_state(config, jax.random.PRNGKey(0)),
                       NamedSharding(mesh, P())),
        jax.device_put(coarse, bat), jax.device_put(fine, bat), rng)

    for k in m1:
        assert float(m1[k]) == pytest.approx(float(m2[k]), rel=1e-4), k
        assert float(m0[k]) == pytest.approx(float(m2[k]), rel=1e-3), k
    for a, b in zip(jax.tree.leaves(s1.c_params), jax.tree.leaves(s2.c_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)
    # Generator params: Adam's step-1 update is +-lr for ANY nonzero
    # grad (m_hat/sqrt(v_hat) = sign(g) at init), so ulp-level
    # reduction-order deltas on near-zero grads show up as <=2*lr
    # (5e-4) sign flips on a handful of weights. Bound by 2*lr + eps and
    # require the flips to be rare; per-apply numerics are pinned tightly
    # by the dedicated forward/GP tests above.
    n_big = n_tot = 0
    for a, b in zip(jax.tree.leaves(s1.g_params), jax.tree.leaves(s2.g_params)):
        d = np.abs(np.asarray(a) - np.asarray(b))
        np.testing.assert_allclose(d.max(), 0, atol=2 * 2.5e-4 + 1e-5)
        n_big += int((d > 5e-5).sum())
        n_tot += d.size
    assert n_big / n_tot < 0.005, (n_big, n_tot)

    with pytest.raises(NotImplementedError, match="unconditional"):
        build_dp_spatial_train_step(
            Config(coarse_size=16, fine_size=128, filters=8,
                   num_res_blocks=1, critic_conditional=True, hp=hp), mesh)


def test_tiled_sr_inference_dp_mesh_bit_identical():
    """Multi-chip tiled inference: tiles sharded over a DP mesh are
    bit-identical to the single-device tiler, for row bands and 2-D tiles,
    including ragged dispatch tails (tiles_per_dispatch not a multiple of
    the mesh size — rounded up internally)."""
    config = Config(coarse_size=16, fine_size=128, filters=8, num_res_blocks=1,
                    hp=HyperParams(batch_size=2))
    gen, _ = make_models(config)
    coarse = np.random.default_rng(1).standard_normal((2, 48, 40, 7)).astype(np.float32)
    params = gen.init(jax.random.PRNGKey(0), jnp.asarray(coarse[:, :16, :16]))
    mesh = make_mesh()  # all (8 virtual) devices on the data axis

    for kwargs in (
        dict(tile_rows=16, overlap=8),
        dict(tile_rows=16, overlap=8, tile_cols=16, tiles_per_dispatch=3),
    ):
        want = tiled_sr_inference(config, params, coarse, **kwargs)
        got = tiled_sr_inference(config, params, coarse, mesh=mesh, **kwargs)
        np.testing.assert_array_equal(got, want), kwargs
