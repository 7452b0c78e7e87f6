"""Train-step tests: GP correctness against an analytic critic, update
schedule parity (G updates at steps 0, 5, 10, ... — wasserstein.py:136),
state threading, loss finiteness, and a smoke test that training reduces
content loss on a toy task. (The reference has no trainer tests; SURVEY §4
calls for exactly these.)
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from downgan_tpu.config.config import Config, HyperParams
from downgan_tpu.training.state import create_state, make_models
from downgan_tpu.training.wgan import (
    build_epoch_scan,
    build_eval_metrics,
    build_train_step,
    gradient_penalty,
)


def small_config(**hp_kw) -> Config:
    hp = HyperParams(batch_size=4, critic_iterations=5, **hp_kw)
    return Config(
        coarse_size=16,
        fine_size=128,
        n_covariates=7,
        n_predictands=2,
        filters=8,
        num_res_blocks=1,
        hp=hp,
    )


@pytest.fixture(scope="module")
def setup():
    config = small_config()
    gen, critic = make_models(config)
    state = create_state(config, jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(42)
    coarse = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 7))
    fine = jax.random.normal(jax.random.PRNGKey(2), (4, 128, 128, 2))
    return config, gen, critic, state, rng, coarse, fine


def test_gradient_penalty_analytic():
    """For C(x) = 2*sum(x): grad wrt input = 2 everywhere, per-sample norm
    = 2*sqrt(P), so GP = (2*sqrt(P) - 1)^2 regardless of alpha."""
    def critic_apply(params, x):
        return params * jnp.sum(x.reshape(x.shape[0], -1), axis=1, keepdims=True)

    b, h, w, c = 3, 4, 4, 2
    p = h * w * c
    real = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, c))
    fake = jax.random.normal(jax.random.PRNGKey(1), (b, h, w, c))
    alpha = jax.random.uniform(jax.random.PRNGKey(2), (b, 1, 1, 1))
    gp = gradient_penalty(critic_apply, jnp.float32(2.0), real, fake, alpha)
    expected = (2.0 * np.sqrt(p) - 1.0) ** 2
    assert float(gp) == pytest.approx(expected, rel=1e-5)


def test_gradient_penalty_differentiable_in_params():
    """The GP term must carry second-order gradient signal into the critic
    params (the double-backward at wasserstein.py:100-117)."""
    def critic_apply(params, x):
        return params * jnp.sum(x.reshape(x.shape[0], -1) ** 2, axis=1, keepdims=True)

    real = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 1))
    fake = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 1))
    alpha = jnp.full((2, 1, 1, 1), 0.5)
    g = jax.grad(
        lambda p: gradient_penalty(critic_apply, p, real, fake, alpha)
    )(jnp.float32(1.5))
    assert np.isfinite(float(g))
    assert abs(float(g)) > 0


def test_step_increments_and_updates(setup):
    config, gen, critic, state, rng, coarse, fine = setup
    step_fn = jax.jit(build_train_step(config, gen, critic, with_metrics=False))
    new_state, metrics = step_fn(state, coarse, fine, rng)
    assert int(new_state.step) == 1
    # Critic always updates.
    c_diff = sum(
        float(jnp.sum(jnp.abs(a - b)))
        for a, b in zip(jax.tree.leaves(state.c_params), jax.tree.leaves(new_state.c_params))
    )
    assert c_diff > 0
    # Generator updates at step 0 (num_steps % 5 == 0 before increment).
    g_diff = sum(
        float(jnp.sum(jnp.abs(a - b)))
        for a, b in zip(jax.tree.leaves(state.g_params), jax.tree.leaves(new_state.g_params))
    )
    assert g_diff > 0
    assert np.isfinite(float(metrics["critic_loss"]))
    assert np.isfinite(float(metrics["Wass"]))


def test_generator_update_schedule(setup):
    """G must update exactly at steps where step % critic_iterations == 0:
    steps 0 and 5 out of 0..5."""
    config, gen, critic, state, rng, coarse, fine = setup
    step_fn = jax.jit(build_train_step(config, gen, critic, with_metrics=False))

    def g_sum(s):
        return sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(s.g_params))

    updated_at = []
    s = state
    for i in range(6):
        before = g_sum(s)
        s, _ = step_fn(s, coarse, fine, rng)
        if g_sum(s) != before:
            updated_at.append(i)
    assert updated_at == [0, 5]


def test_metrics_registry(setup):
    config, gen, critic, state, rng, coarse, fine = setup
    step_fn = jax.jit(build_train_step(config, gen, critic, with_metrics=True))
    _, metrics = step_fn(state, coarse, fine, rng)
    for key in ("MAE", "MSE", "MSSSIM", "Wass"):
        assert key in metrics
        assert np.isfinite(float(metrics[key])), key


def test_eval_metrics(setup):
    config, gen, critic, state, _, coarse, fine = setup
    eval_fn = jax.jit(build_eval_metrics(config, gen, critic))
    metrics = eval_fn(state, coarse, fine)
    assert set(metrics) == {"MAE", "MSE", "MSSSIM", "Wass"}
    assert all(np.isfinite(float(v)) for v in metrics.values())


def test_epoch_scan_runs_and_counts_steps(setup):
    config, gen, critic, state, rng, _, _ = setup
    n, b = 12, 4
    coarse_all = jax.random.normal(jax.random.PRNGKey(5), (n, 16, 16, 7))
    fine_all = jax.random.normal(jax.random.PRNGKey(6), (n, 128, 128, 2))
    perm = jnp.arange(n).reshape(n // b, b)
    epoch_fn = jax.jit(build_epoch_scan(config, gen, critic, with_metrics=False))
    new_state, stacked = epoch_fn(state, coarse_all, fine_all, perm, rng)
    assert int(new_state.step) == n // b
    assert stacked["critic_loss"].shape == (n // b,)
    assert bool(jnp.all(jnp.isfinite(stacked["critic_loss"])))


def test_freq_sep_step_runs(setup):
    config, *_ = setup
    config = config.replace(hp=HyperParams(batch_size=4, freq_sep=True))
    gen, critic = make_models(config)
    state = create_state(config, jax.random.PRNGKey(0))
    coarse = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 7))
    fine = jax.random.normal(jax.random.PRNGKey(2), (4, 128, 128, 2))
    step_fn = jax.jit(build_train_step(config, gen, critic, with_metrics=False))
    new_state, metrics = step_fn(state, coarse, fine, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["critic_loss"]))
    assert int(new_state.step) == 1


def test_training_reduces_content_loss():
    """Toy learnability: with adversarial weight ~0, a few G updates on a
    fixed batch must reduce L1 toward a fixed target."""
    hp = HyperParams(batch_size=2, critic_iterations=1, gamma=0.0, lr=1e-3)
    config = Config(
        coarse_size=8, fine_size=16, n_covariates=3, n_predictands=2,
        filters=8, num_res_blocks=1, hp=hp,
    )
    gen, critic = make_models(config)
    state = create_state(config, jax.random.PRNGKey(0))
    coarse = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 3))
    fine = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 2)) * 0.1
    step_fn = jax.jit(build_train_step(config, gen, critic, with_metrics=False))

    def l1(s):
        return float(jnp.mean(jnp.abs(gen.apply(s.g_params, coarse) - fine)))

    before = l1(state)
    s = state
    for _ in range(30):
        s, _ = step_fn(s, coarse, fine, jax.random.PRNGKey(9))
    after = l1(s)
    assert after < before


def test_fused_round_runs_and_matches_schedule():
    """build_fused_round: n_critic critic updates on distinct minibatches +
    one generator update per call (SURVEY §7 fast path b)."""
    from downgan_tpu.training.wgan import build_fused_round

    config = small_config()
    n = config.hp.critic_iterations
    gen, critic = make_models(config)
    state = create_state(config, jax.random.PRNGKey(0))
    round_fn = jax.jit(build_fused_round(config, gen, critic, with_metrics=False))
    coarse_n = jax.random.normal(jax.random.PRNGKey(1), (n, 4, 16, 16, 7))
    fine_n = jax.random.normal(jax.random.PRNGKey(2), (n, 4, 128, 128, 2))
    new_state, metrics = round_fn(state, coarse_n, fine_n, jax.random.PRNGKey(3))
    assert int(new_state.step) == n
    assert np.isfinite(float(metrics["critic_loss"]))
    assert np.isfinite(float(metrics["gen_loss"]))
    # both networks actually updated
    for old, new in ((state.g_params, new_state.g_params),
                     (state.c_params, new_state.c_params)):
        assert not np.allclose(
            np.asarray(jax.tree.leaves(old)[0]), np.asarray(jax.tree.leaves(new)[0])
        )


def test_ema_generator_weights():
    """hp.ema_decay maintains an EMA of the generator that moves slower
    than the live params and only when the generator updates."""
    hp = HyperParams(batch_size=4, critic_iterations=2, ema_decay=0.9)
    config = small_config().replace(hp=hp)
    gen, critic = make_models(config)
    state = create_state(config, jax.random.PRNGKey(0))
    assert state.g_ema is not None
    step = jax.jit(build_train_step(config, gen, critic, with_metrics=False))
    coarse = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 7))
    fine = jax.random.normal(jax.random.PRNGKey(2), (4, 128, 128, 2))
    rng = jax.random.PRNGKey(3)

    leaf = lambda t: np.asarray(jax.tree.leaves(t)[0])
    g0 = leaf(state.g_params)
    # step 0: G updates (step % 2 == 0) -> ema moves toward new params
    s1, _ = step(state, coarse, fine, rng)
    d_params = np.abs(leaf(s1.g_params) - g0).mean()
    d_ema = np.abs(leaf(s1.g_ema) - g0).mean()
    assert d_params > 0 and d_ema > 0
    assert d_ema == pytest.approx(0.1 * d_params, rel=1e-3)  # (1-decay) step
    # step 1: G skipped -> ema unchanged
    s2, _ = step(s1, coarse, fine, rng)
    np.testing.assert_array_equal(leaf(s2.g_ema), leaf(s1.g_ema))


def test_ema_off_keeps_state_lean():
    config = small_config()
    state = create_state(config, jax.random.PRNGKey(0))
    assert state.g_ema is None


def _accum_config(grad_accum: int, **hp_kw) -> Config:
    hp = HyperParams(
        batch_size=8, critic_iterations=2, grad_accum=grad_accum,
        metrics_to_calculate=("MAE", "MSE", "Wass"), **hp_kw,
    )
    return Config(coarse_size=8, fine_size=32, filters=8, num_res_blocks=1,
                  hp=hp)


def test_grad_accum_matches_full_batch():
    """hp.grad_accum: the accumulated step equals the full-batch step up
    to fp32 summation order — same post-update params, same losses."""
    cfg_full = _accum_config(1)
    cfg_acc = _accum_config(4)
    gen, critic = make_models(cfg_full)
    state = create_state(cfg_full, jax.random.PRNGKey(0))
    coarse = jax.random.normal(jax.random.PRNGKey(1), (8, 8, 8, 7))
    fine = jax.random.normal(jax.random.PRNGKey(2), (8, 32, 32, 2))
    rng = jax.random.PRNGKey(3)

    s_full, m_full = jax.jit(build_train_step(cfg_full, gen, critic))(
        state, coarse, fine, rng)
    s_acc, m_acc = jax.jit(build_train_step(cfg_acc, gen, critic))(
        state, coarse, fine, rng)

    assert int(s_full.step) == int(s_acc.step) == 1
    for a, b in zip(jax.tree.leaves(s_full.g_params),
                    jax.tree.leaves(s_acc.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)
    for a, b in zip(jax.tree.leaves(s_full.c_params),
                    jax.tree.leaves(s_acc.c_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)
    for k in ("critic_loss", "gen_loss"):
        assert float(m_full[k]) == pytest.approx(float(m_acc[k]), rel=1e-4)


def test_grad_accum_fused_round_matches():
    """grad_accum under the fused n-critic schedule: same round result as
    the full-batch fused round."""
    from downgan_tpu.training.wgan import build_fused_round

    cfg_full = _accum_config(1, schedule="fused")
    cfg_acc = _accum_config(2, schedule="fused")
    n = cfg_full.hp.critic_iterations
    gen, critic = make_models(cfg_full)
    state = create_state(cfg_full, jax.random.PRNGKey(0))
    coarse_n = jax.random.normal(jax.random.PRNGKey(1), (n, 8, 8, 8, 7))
    fine_n = jax.random.normal(jax.random.PRNGKey(2), (n, 8, 32, 32, 2))
    rng = jax.random.PRNGKey(3)

    s_full, _ = jax.jit(build_fused_round(cfg_full, gen, critic))(
        state, coarse_n, fine_n, rng)
    s_acc, _ = jax.jit(build_fused_round(cfg_acc, gen, critic))(
        state, coarse_n, fine_n, rng)
    assert int(s_full.step) == int(s_acc.step) == n
    for a, b in zip(jax.tree.leaves(s_full.c_params),
                    jax.tree.leaves(s_acc.c_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)
    for a, b in zip(jax.tree.leaves(s_full.g_params),
                    jax.tree.leaves(s_acc.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_fused_round_metrics_reuse_fake():
    """Under the fused schedule, metrics_reuse_fake computes the metric
    pass on the LAST critic-iteration fake (pre-G-update params, the G
    minibatch) instead of a fresh post-update forward: params identical
    either way, MAE equals the hand-computed value on that fake."""
    from downgan_tpu.ops.losses import content_loss
    from downgan_tpu.training.wgan import build_fused_round

    cfg = _accum_config(1, schedule="fused")
    cfg_reuse = _accum_config(1, schedule="fused", metrics_reuse_fake=True)
    n = cfg.hp.critic_iterations
    gen, critic = make_models(cfg)
    state = create_state(cfg, jax.random.PRNGKey(0))
    coarse_n = jax.random.normal(jax.random.PRNGKey(1), (n, 8, 8, 8, 7))
    fine_n = jax.random.normal(jax.random.PRNGKey(2), (n, 8, 32, 32, 2))
    rng = jax.random.PRNGKey(3)

    s_fresh, m_fresh = jax.jit(build_fused_round(cfg, gen, critic))(
        state, coarse_n, fine_n, rng)
    s_reuse, m_reuse = jax.jit(build_fused_round(cfg_reuse, gen, critic))(
        state, coarse_n, fine_n, rng)

    # the training update itself is untouched by the metric fast path
    for a, b in zip(jax.tree.leaves(s_fresh.g_params),
                    jax.tree.leaves(s_reuse.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # reused metric == metric on the pre-update fake of the last minibatch
    fake_last = gen.apply(state.g_params, coarse_n[-1])
    want_mae = float(content_loss(fine_n[-1], fake_last))
    assert float(m_reuse["MAE"]) == pytest.approx(want_mae, rel=1e-5)
    # ... which differs from the fresh post-update metric
    assert float(m_fresh["MAE"]) != pytest.approx(float(m_reuse["MAE"]),
                                                  rel=1e-7)


def test_grad_accum_validation():
    with pytest.raises(ValueError, match="grad_accum"):
        HyperParams(batch_size=8, grad_accum=3)
    with pytest.raises(ValueError, match="grad_accum"):
        HyperParams(grad_accum=0)
    # batch-std-normalized regularizers compose with grad_accum under
    # documented per-microbatch normalization semantics (config.py) —
    # the combo must construct.
    for kw in ({"eof_lambda": 1.0}, {"divergence_lambda": 0.1},
               {"vorticity_lambda": 0.1}):
        HyperParams(batch_size=8, grad_accum=2, **kw)


def test_accum_machinery_k1_equals_plain_vag_on_physics_loss():
    """Per-microbatch normalization semantics reduce EXACTLY to the
    full-batch computation at one microbatch: _accum_value_and_grad(k=1)
    on a batch-std-normalized loss == jax.value_and_grad."""
    from downgan_tpu.ops.losses import divergence_loss
    from downgan_tpu.training.wgan import _accum_value_and_grad

    fine = jax.random.normal(jax.random.PRNGKey(0), (8, 16, 16, 2))
    fake0 = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 16, 2))

    def loss(delta, fine, fake0):
        # blend toward the target: changes the divergence field's SHAPE
        # (a constant offset would be killed by the spatial derivative)
        return divergence_loss(fine, fake0 + delta * fine)

    delta = jnp.full((), 0.1, jnp.float32)
    v1, g1 = jax.value_and_grad(loss)(delta, fine, fake0)
    v2, g2 = _accum_value_and_grad(loss, 1, has_aux=False)(delta, fine, fake0)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-6)

    # and at k=2 it equals the mean of the per-microbatch results — the
    # documented semantics, computed by hand
    v3, g3 = _accum_value_and_grad(loss, 2, has_aux=False)(delta, fine, fake0)
    vs, gs = zip(*(jax.value_and_grad(loss)(delta, fine[i:i + 4],
                                            fake0[i:i + 4])
                   for i in (0, 4)))
    np.testing.assert_allclose(np.asarray(v3), np.mean(vs), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g3), np.mean(gs), rtol=1e-5)


def test_grad_accum_composes_with_physics_regularizers():
    """The physics-regularized objective steps under microbatching: full
    train step with divergence+vorticity terms and grad_accum=2 runs,
    yields finite losses, and actually applies the regularizer (different
    G update than the unregularized step)."""
    cfg = _accum_config(2, divergence_lambda=0.5, vorticity_lambda=0.5)
    cfg_plain = _accum_config(2)
    gen, critic = make_models(cfg)
    state = create_state(cfg, jax.random.PRNGKey(0))
    coarse = jax.random.normal(jax.random.PRNGKey(1), (8, 8, 8, 7))
    fine = jax.random.normal(jax.random.PRNGKey(2), (8, 32, 32, 2))
    rng = jax.random.PRNGKey(3)

    s_reg, m_reg = jax.jit(build_train_step(cfg, gen, critic))(
        state, coarse, fine, rng)
    s_plain, _ = jax.jit(build_train_step(cfg_plain, gen, critic))(
        state, coarse, fine, rng)
    assert int(s_reg.step) == 1
    for k in ("critic_loss", "gen_loss"):
        assert np.isfinite(float(m_reg[k])), k
    # the regularizer reached the generator update (step 0 updates G)
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(jax.tree.leaves(s_reg.g_params),
                             jax.tree.leaves(s_plain.g_params))]
    assert max(diffs) > 0


def test_grad_accum_data_parallel_mesh():
    """grad_accum composes with DP sharding: the accumulated step jits and
    runs over the full device mesh (microbatch reshape splits the sharded
    batch axis; GSPMD handles the re-layout)."""
    from downgan_tpu.parallel.dp import build_dp_train_step
    from downgan_tpu.parallel.mesh import make_mesh, replicate_state, shard_batch

    cfg = _accum_config(2)
    gen, critic = make_models(cfg)
    mesh = make_mesh()
    coarse = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (8, 8, 8, 7)))
    fine = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (8, 32, 32, 2)))
    step = build_dp_train_step(cfg, gen, critic, mesh, donate_state=False)
    state = replicate_state(mesh, create_state(cfg, jax.random.PRNGKey(0)))
    c, f = shard_batch(mesh, coarse, fine)
    new_state, metrics = step(state, c, f, jax.random.PRNGKey(3))
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["critic_loss"]))


def test_lr_schedule_shapes():
    """lr_schedule_fn: warmup ramps 0 -> lr, cosine/linear decay to
    lr * lr_final_factor at lr_decay_steps, constant stays flat."""
    from downgan_tpu.training.state import lr_schedule_fn

    hp = HyperParams(lr=1e-3, lr_schedule="cosine", lr_warmup_steps=10,
                     lr_decay_steps=100, lr_final_factor=0.1)
    s = lr_schedule_fn(hp)
    assert float(s(0)) == pytest.approx(0.0)
    assert float(s(10)) == pytest.approx(1e-3, rel=1e-6)
    assert float(s(100)) == pytest.approx(1e-4, rel=1e-4)
    assert float(s(55)) < 1e-3  # strictly inside the decay

    hp = HyperParams(lr=1e-3, lr_schedule="linear", lr_decay_steps=100)
    s = lr_schedule_fn(hp)
    assert float(s(0)) == pytest.approx(1e-3)
    assert float(s(50)) == pytest.approx(5e-4, rel=1e-5)
    assert float(s(100)) == pytest.approx(0.0, abs=1e-12)

    hp = HyperParams(lr=1e-3)  # parity default
    s = lr_schedule_fn(hp)
    assert float(s(0)) == float(s(10_000)) == pytest.approx(1e-3)


def test_lr_schedule_validation():
    with pytest.raises(ValueError, match="lr_decay_steps"):
        HyperParams(lr_schedule="cosine")
    with pytest.raises(ValueError, match="unknown lr_schedule"):
        HyperParams(lr_schedule="step")
    with pytest.raises(ValueError, match="lr_warmup_steps must be <"):
        HyperParams(lr_schedule="linear", lr_decay_steps=5, lr_warmup_steps=5)


def test_lr_schedule_drives_update_magnitude():
    """With a decaying schedule the critic's Adam steps shrink over
    updates; the parity (constant) opt_state pytree stays schedule-free."""
    import optax

    from downgan_tpu.training.state import make_optimizer

    cfg_const = _accum_config(1)
    cfg_decay = _accum_config(
        1, lr_schedule="linear", lr_decay_steps=4, lr_final_factor=0.0)
    # constant path keeps the stateless scale transform (checkpoint compat)
    leaves_const = jax.tree.leaves(
        make_optimizer(cfg_const).init({"w": jnp.ones((3,))}))
    leaves_decay = jax.tree.leaves(
        make_optimizer(cfg_decay).init({"w": jnp.ones((3,))}))
    assert len(leaves_decay) > len(leaves_const)

    tx = make_optimizer(cfg_decay)
    params = {"w": jnp.ones((3,))}
    opt_state = tx.init(params)
    grads = {"w": jnp.full((3,), 0.5)}
    sizes = []
    for _ in range(4):
        updates, opt_state = tx.update(grads, opt_state, params)
        sizes.append(float(jnp.abs(updates["w"]).mean()))
        params = optax.apply_updates(params, updates)
    # update i applies schedule(count=i), so the 4th uses schedule(3)
    assert sizes[0] > sizes[1] > sizes[2] > sizes[3]
    assert sizes[3] < 0.3 * sizes[0]


def test_lr_schedule_trains_end_to_end():
    """A scheduled config runs the full jitted step and the schedule count
    rides in the opt_state (checkpoint-resumable by construction)."""
    cfg = _accum_config(1, lr_schedule="cosine", lr_warmup_steps=2,
                        lr_decay_steps=10, lr_final_factor=0.1)
    gen, critic = make_models(cfg)
    state = create_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(build_train_step(cfg, gen, critic, with_metrics=False))
    coarse = jax.random.normal(jax.random.PRNGKey(1), (8, 8, 8, 7))
    fine = jax.random.normal(jax.random.PRNGKey(2), (8, 32, 32, 2))
    s = state
    for _ in range(3):
        s, m = step(s, coarse, fine, jax.random.PRNGKey(3))
    assert int(s.step) == 3
    assert np.isfinite(float(m["critic_loss"]))
    # G updated at steps 0 and 2 (critic_iterations=2) -> its schedule
    # count is 2 while the critic's is 3
    c_count = int([l for l in jax.tree.leaves(s.c_opt_state)
                   if l.ndim == 0][0])
    assert c_count >= 1
