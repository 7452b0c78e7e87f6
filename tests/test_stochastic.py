"""Stochastic generator (Config.noise_channels) + ensemble generation.

Beyond parity: the reference generator is deterministic
(``DoWnGAN/networks/generator.py:83-90``); these tests pin the latent
plumbing — fresh noise per training forward, a FIXED realization for
eval/plots/serving, independent deterministic members at inference.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from downgan_tpu.config.config import Config, HyperParams
from downgan_tpu.training.state import create_state, make_models, param_count
from downgan_tpu.training.wgan import (
    build_eval_metrics,
    build_train_step,
    eval_noise_rng,
    make_noise_injector,
)


def tiny_config(noise=2, **hp_kw):
    hp = HyperParams(batch_size=4, metrics_to_calculate=("MAE", "MSE", "Wass"),
                     **hp_kw)
    return Config(coarse_size=8, fine_size=32, filters=8, num_res_blocks=1,
                  noise_channels=noise, hp=hp)


def test_injector_semantics():
    config = tiny_config(noise=3)
    inject = make_noise_injector(config)
    coarse = jnp.zeros((2, 8, 8, 7))
    out = inject(jax.random.PRNGKey(0), coarse)
    assert out.shape == (2, 8, 8, 10)
    np.testing.assert_array_equal(np.asarray(out[..., :7]), 0.0)
    # distinct keys -> distinct latents; same key -> identical
    out2 = inject(jax.random.PRNGKey(1), coarse)
    assert not np.array_equal(np.asarray(out[..., 7:]), np.asarray(out2[..., 7:]))
    np.testing.assert_array_equal(
        np.asarray(inject(jax.random.PRNGKey(0), coarse)), np.asarray(out))
    # identity (the SAME object) when off — the parity path is untouched
    off = make_noise_injector(tiny_config(noise=0))
    assert off(jax.random.PRNGKey(0), coarse) is coarse
    with pytest.raises(ValueError, match=">= 0"):
        make_noise_injector(tiny_config(noise=-1))


def test_stochastic_step_trains_and_eval_is_deterministic():
    config = tiny_config(noise=2)
    gen, critic = make_models(config)
    # generator conv1 input widens by noise_channels exactly
    base = param_count(create_state(tiny_config(noise=0),
                                    jax.random.PRNGKey(0)).g_params)
    state = create_state(config, jax.random.PRNGKey(0))
    assert param_count(state.g_params) - base == 3 * 3 * 2 * 8

    coarse = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 7))
    fine = jax.random.normal(jax.random.PRNGKey(2), (4, 32, 32, 2))
    step = jax.jit(build_train_step(config, gen, critic))
    m_by_rng = {}
    for seed in (0, 1):
        s, metrics = step(state, coarse, fine, jax.random.PRNGKey(seed))
        assert all(np.isfinite(float(v)) for v in metrics.values())
        m_by_rng[seed] = float(metrics["MAE"])
    # the metric pass draws noise from the step rng -> different fakes
    assert m_by_rng[0] != m_by_rng[1]

    ev = jax.jit(build_eval_metrics(config, gen, critic))
    a = ev(s, coarse, fine)
    b = ev(s, coarse, fine)
    for k in a:
        assert float(a[k]) == float(b[k])  # fixed eval realization


def test_generate_fields_members_and_determinism():
    from downgan_tpu.inference import generate_ensemble, generate_fields

    config = tiny_config(noise=2)
    gen, _ = make_models(config)
    state = create_state(config, jax.random.PRNGKey(0))
    coarse = np.random.default_rng(0).standard_normal((5, 8, 8, 7)).astype(np.float32)

    m0 = generate_fields(config, state.g_params, coarse, chunk_size=4, member=0)
    m0b = generate_fields(config, state.g_params, coarse, chunk_size=4, member=0)
    m1 = generate_fields(config, state.g_params, coarse, chunk_size=4, member=1)
    np.testing.assert_array_equal(m0, m0b)  # bit-reproducible
    assert not np.array_equal(m0, m1)  # independent members

    ens = generate_ensemble(config, state.g_params, coarse, 3, chunk_size=4)
    assert ens.shape == (3, 5, 32, 32, 2)
    np.testing.assert_array_equal(ens[0], m0)
    np.testing.assert_array_equal(ens[1], m1)

    with pytest.raises(ValueError, match="stochastic"):
        generate_ensemble(tiny_config(noise=0), state.g_params, coarse, 2)


def test_ensemble_netcdf_member_dimension(tmp_path):
    import h5py

    from downgan_tpu.inference import write_generated_netcdf

    fields = np.random.default_rng(0).standard_normal((3, 4, 8, 8, 2)).astype(np.float32)
    path = str(tmp_path / "ens.nc")
    write_generated_netcdf(path, fields)
    with h5py.File(path, "r") as f:
        assert f["u10"].shape == (3, 4, 8, 8)
        assert f["member"].shape == (3,)
        assert f["u10"].dims[0].label == "member"
        np.testing.assert_array_equal(f["u10"][...], fields[..., 0])


def test_tiled_inference_with_noise_stitches_seamlessly():
    """The tiler draws ONE whole-domain latent before tiling, so the tiled
    result matches the whole-field forward on the SAME latent (to seam
    tolerance) and repeated calls are bit-identical."""
    from downgan_tpu.parallel.spatial import tiled_sr_inference

    config = Config(coarse_size=16, fine_size=128, filters=8, num_res_blocks=1,
                    noise_channels=2, hp=HyperParams(batch_size=2))
    gen, _ = make_models(config)
    coarse = np.random.default_rng(0).standard_normal((1, 48, 16, 7)).astype(np.float32)
    params = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 9)))

    z = np.random.default_rng((config.seed, 0x5E11)).standard_normal(
        (1, 48, 16, 2)).astype(np.float32)
    full = np.asarray(jax.jit(gen.apply)(
        params, jnp.asarray(np.concatenate([coarse, z], axis=-1))))
    tiled = tiled_sr_inference(config, params, coarse, tile_rows=16, overlap=8)
    assert tiled.shape == full.shape
    assert np.abs(tiled - full).max() < 5e-2
    tiled2 = tiled_sr_inference(config, params, coarse, tile_rows=16, overlap=8)
    np.testing.assert_array_equal(tiled, tiled2)


def test_trainer_stochastic_end_to_end(tmp_path):
    """Whole Trainer stack with a stochastic generator: train, eval scan,
    plots, best tracking — the fixed eval realization keeps the test pass
    and the best-bundle selection deterministic."""
    from downgan_tpu.data.dataset import DeviceDataset, synthetic_dataset
    from downgan_tpu.tracking import TrackingStore
    from downgan_tpu.training.trainer import Trainer

    config = tiny_config(noise=2)
    coarse, fine = synthetic_dataset(n_samples=24, coarse_size=8, fine_size=32)
    train_ds = DeviceDataset.from_numpy(coarse[:16], fine[:16])
    test_ds = DeviceDataset.from_numpy(coarse[16:], fine[16:])
    store = TrackingStore(str(tmp_path / "exps"))
    run = store.create_run(store.create_experiment("t")).start()
    trainer = Trainer(config, train_ds, test_ds, run=run, verbose=False,
                      track_best="MAE")
    trainer.train(epochs=2)
    best_dir = os.path.join(run.artifact_dir, "best")
    assert os.path.exists(os.path.join(best_dir, "best.json"))
    assert os.path.exists(os.path.join(run.artifact_dir, "train_images.png"))

    # the bundle of a STOCHASTIC generator must be loadable: the restore
    # template needs generator_in_channels (covariates + noise), not
    # n_covariates (regression — Orbax validates the target tree shapes)
    from downgan_tpu.inference import generate_fields, restore_generator_params

    params = restore_generator_params(
        config, os.path.join(best_dir, "params"), weights_only=True)
    out = generate_fields(config, params,
                          np.asarray(test_ds.coarse, np.float32), chunk_size=4)
    assert out.shape == (8, 32, 32, 2)
    assert np.isfinite(out).all()


def test_crps_matches_bruteforce_and_degenerates_to_mae():
    from downgan_tpu.ops.ensemble import crps_ensemble, ensemble_spread

    rng = np.random.default_rng(0)
    members = rng.standard_normal((5, 3, 4, 4, 2)).astype(np.float32)
    truth = rng.standard_normal((3, 4, 4, 2)).astype(np.float32)

    # independent O(M^2) brute force
    m = members.shape[0]
    t1 = np.mean([np.abs(members[i] - truth) for i in range(m)], axis=0)
    t2 = np.zeros_like(t1)
    for i in range(m):
        for j in range(m):
            t2 += np.abs(members[i] - members[j])
    want = float(np.mean(t1 - t2 / (2 * m * (m - 1))))
    got = float(crps_ensemble(members, truth))
    assert got == pytest.approx(want, rel=1e-5)

    # degenerate ensemble: CRPS == MAE exactly, spread == 0
    same = np.repeat(members[:1], 4, axis=0)
    mae = float(np.mean(np.abs(members[0] - truth)))
    assert float(crps_ensemble(same, truth)) == pytest.approx(mae, rel=1e-6)
    assert float(ensemble_spread(same)) == 0.0
    # a spread ensemble scores better than any degenerate one built from it
    assert got < float(crps_ensemble(np.repeat(members[:1], 5, axis=0), truth)) + 1e-6


def test_ensemble_metrics_end_to_end():
    from downgan_tpu.inference import ensemble_metrics

    config = tiny_config(noise=2)
    state = create_state(config, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    coarse = rng.standard_normal((6, 8, 8, 7)).astype(np.float32)
    fine = rng.standard_normal((6, 32, 32, 2)).astype(np.float32)
    out = ensemble_metrics(config, state.g_params, coarse, fine, 3,
                           chunk_size=4)
    assert out["n_members"] == 3
    assert out["spread"] > 0
    for k in ("CRPS", "ens_mean_MAE", "member_MAE"):
        assert np.isfinite(out[k])
    # fresh-init generator: members are near-identical only if the latent
    # were ignored; spread > 0 already asserts it is not
