"""Physics-aware flip augmentation (ops/augment.py): sign-corrected
mirrors preserve the wind field's differential physics, pairs stay
aligned, and the augmented train step runs on both schedules."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from downgan_tpu.config.config import Config, HyperParams
from downgan_tpu.ops.augment import _axis_flip, make_augment, random_flip_pair
from downgan_tpu.training.state import create_state, make_models
from downgan_tpu.training.wgan import build_train_step


def test_axis_flip_values():
    """Lon flip mirrors W and negates the named channels only."""
    x = jnp.asarray(np.arange(2 * 2 * 3 * 2, dtype=np.float32).reshape(2, 2, 3, 2))
    out = np.asarray(_axis_flip(x, 2, (0,)))
    ref = np.asarray(x)[:, :, ::-1, :].copy()
    ref[..., 0] *= -1
    np.testing.assert_array_equal(out, ref)


def test_flip_preserves_true_divergence_and_vorticity():
    """The sign-corrected mirror's central-difference divergence
    (du/dx + dv/dy) and vorticity (dv/dx - du/dy) are EXACTLY the spatial
    mirror of the original's — the flip is physical. A naive image flip
    (no sign correction) breaks this."""
    rng = np.random.default_rng(0)
    uv = rng.standard_normal((1, 16, 16, 2)).astype(np.float32)

    def div(f):
        dudx = np.gradient(f[0, :, :, 0], axis=1)
        dvdy = np.gradient(f[0, :, :, 1], axis=0)
        return dudx + dvdy

    def vort(f):
        dvdx = np.gradient(f[0, :, :, 1], axis=1)
        dudy = np.gradient(f[0, :, :, 0], axis=0)
        return dvdx - dudy

    # lon mirror: u -> -u
    flipped = np.asarray(_axis_flip(jnp.asarray(uv), 2, (0,)))
    np.testing.assert_allclose(div(flipped), div(uv)[:, ::-1], atol=1e-6)
    np.testing.assert_allclose(vort(flipped), -vort(uv)[:, ::-1], atol=1e-6)
    naive = uv[:, :, ::-1, :]
    assert not np.allclose(div(naive), div(uv)[:, ::-1], atol=1e-3)

    # lat mirror: v -> -v
    flipped = np.asarray(_axis_flip(jnp.asarray(uv), 1, (1,)))
    np.testing.assert_allclose(div(flipped), div(uv)[::-1, :], atol=1e-6)
    np.testing.assert_allclose(vort(flipped), -vort(uv)[::-1, :], atol=1e-6)


def test_pair_alignment_and_coverage():
    """Coarse and fine of one sample share the flip decision; over many
    samples all four flip combinations occur."""
    b = 64
    # channel 2 of coarse is a lon-asymmetric scalar marker; fine's u
    # channel carries the same asymmetry
    coarse = np.zeros((b, 4, 4, 3), np.float32)
    coarse[:, :, 0, 2] = 1.0
    fine = np.zeros((b, 8, 8, 2), np.float32)
    fine[:, :, 0, 0] = 1.0
    fine[:, 0, :, 1] = 1.0  # lat-asymmetric v marker
    c2, f2 = random_flip_pair(jax.random.PRNGKey(0), jnp.asarray(coarse),
                              jnp.asarray(fine))
    c2, f2 = np.asarray(c2), np.asarray(f2)
    lon_flipped_c = c2[:, 0, -1, 2] == 1.0  # marker moved to far column
    lon_flipped_f = f2[:, 0, -1, 0] == -1.0  # moved AND negated (u channel)
    np.testing.assert_array_equal(lon_flipped_c, lon_flipped_f)
    lat_flipped_f = f2[:, -1, 2, 1] == -1.0  # v marker moved + negated
    n_lon = int(lon_flipped_c.sum())
    n_lat = int(lat_flipped_f.sum())
    assert 8 < n_lon < 56 and 8 < n_lat < 56  # both decisions exercised


def test_double_flip_identity():
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 4, 6, 3)),
                    jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(_axis_flip(_axis_flip(x, 2, (0,)), 2, (0,))), np.asarray(x))


def _aug_config(**hp_kw) -> Config:
    hp = HyperParams(batch_size=8, critic_iterations=2, augment_flips=True,
                     metrics_to_calculate=("MAE", "MSE", "Wass"), **hp_kw)
    return Config(coarse_size=8, fine_size=32, filters=8, num_res_blocks=1,
                  hp=hp)


@pytest.mark.parametrize("schedule", ["reference", "fused"])
def test_augmented_step_runs(schedule):
    cfg = _aug_config(schedule=schedule)
    gen, critic = make_models(cfg)
    state = create_state(cfg, jax.random.PRNGKey(0))
    if schedule == "fused":
        from downgan_tpu.training.wgan import build_fused_round

        n = cfg.hp.critic_iterations
        step = jax.jit(build_fused_round(cfg, gen, critic))
        coarse = jax.random.normal(jax.random.PRNGKey(1), (n, 8, 8, 8, 7))
        fine = jax.random.normal(jax.random.PRNGKey(2), (n, 8, 32, 32, 2))
    else:
        step = jax.jit(build_train_step(cfg, gen, critic))
        coarse = jax.random.normal(jax.random.PRNGKey(1), (8, 8, 8, 7))
        fine = jax.random.normal(jax.random.PRNGKey(2), (8, 32, 32, 2))
    s, m = step(state, coarse, fine, jax.random.PRNGKey(3))
    assert int(s.step) >= 1
    assert np.isfinite(float(m["critic_loss"]))
    # the critic actually updated on the augmented batch
    assert not np.allclose(
        np.asarray(jax.tree.leaves(state.c_params)[0]),
        np.asarray(jax.tree.leaves(s.c_params)[0]))


def test_augment_config_roundtrip():
    cfg = _aug_config().replace(u_channels_coarse=(0, 3))
    cfg2 = Config.from_json(cfg.to_json())
    assert cfg2.hp.augment_flips is True
    assert cfg2.u_channels_coarse == (0, 3)


def test_augment_off_is_parity():
    """augment_flips=False leaves the step bit-identical to before the
    feature existed (alpha stream untouched)."""
    cfg_off = _aug_config().replace(hp=HyperParams(
        batch_size=8, critic_iterations=2,
        metrics_to_calculate=("MAE", "MSE", "Wass")))
    gen, critic = make_models(cfg_off)
    state = create_state(cfg_off, jax.random.PRNGKey(0))
    coarse = jax.random.normal(jax.random.PRNGKey(1), (8, 8, 8, 7))
    fine = jax.random.normal(jax.random.PRNGKey(2), (8, 32, 32, 2))
    s_off, _ = jax.jit(build_train_step(cfg_off, gen, critic))(
        state, coarse, fine, jax.random.PRNGKey(3))
    cfg_on = _aug_config()
    s_on, _ = jax.jit(build_train_step(cfg_on, gen, critic))(
        state, coarse, fine, jax.random.PRNGKey(3))
    # flips actually change the trajectory (sanity that the flag is live)
    assert not np.allclose(
        np.asarray(jax.tree.leaves(s_off.c_params)[0]),
        np.asarray(jax.tree.leaves(s_on.c_params)[0]))
