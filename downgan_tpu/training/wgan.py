"""WGAN-GP training engine (TPU-native, functional core).

Capability parity with the reference trainers
(``DoWnGAN/GAN/wasserstein.py:16-189`` and the frequency-separation variant
``wasserstein_fs.py:15-198``), re-designed as pure jitted functions:

  * One fused ``train_step(state, coarse, fine, rng) -> (state, metrics)``
    owns what the reference spreads over ``_critic_train_iteration``,
    ``_generator_train_iteration``, ``_gp`` and the per-batch metric pass in
    ``mlflow_tools/mlflow_epoch.py:53-63``. No host syncs inside the loop.
  * The gradient penalty's double backward (torch ``autograd.grad(...,
    create_graph=True)``, ``wasserstein.py:100-106``) becomes a nested
    ``jax.grad``: reverse-over-reverse through the critic, compiled by XLA.
  * The ``num_steps % critic_iterations == 0`` generator schedule
    (``wasserstein.py:136``, evaluated *before* the counter increments, so
    the generator updates at steps 0, 5, 10, ...) is a ``lax.cond`` on the
    step carried in :class:`GANTrainState` — semantics preserved exactly,
    including the update at global step 0.
  * ``build_epoch_scan`` runs a whole epoch as one ``lax.scan`` over a
    device-resident dataset with per-epoch permutation indices — one
    compiled program per epoch instead of per-step dispatch.

Reference quirks preserved (behind flags in :class:`HyperParams`):
  * ``double_gp_lambda``: gp_lambda applied twice -> effective weight 100
    (``wasserstein.py:40`` x ``:117``).
  * The reference flattens GP gradients with the *configured* batch size
    (``gradients.view(hp.batch_size, -1)``, ``wasserstein.py:110``), which
    crashes on partial batches; we define drop-last semantics (static
    shapes under jit) so the two coincide on every batch that the
    reference can actually process.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from jax import lax

from downgan_tpu.config.config import Config
from downgan_tpu.models.critic import Critic
from downgan_tpu.models.generator import Generator
from downgan_tpu.ops.losses import content_loss, low_pass, wass_loss
from downgan_tpu.ops.metrics import resolve_metrics
from downgan_tpu.training.state import GANTrainState, make_optimizer

Metrics = Dict[str, jax.Array]


def gradient_penalty(
    critic_apply: Callable[[Any, jax.Array], jax.Array],
    c_params: Any,
    real: jax.Array,
    fake: jax.Array,
    alpha: jax.Array,
    eps: float = 1e-12,
) -> jax.Array:
    """Mean squared deviation of the critic's input-gradient norm from 1.

    interpolated = alpha * real + (1 - alpha) * fake with per-sample alpha
    (``wasserstein.py:91-94``); per-sample gradient norms use the eps=1e-12
    sqrt guard (``wasserstein.py:114``). Differentiable in ``c_params``
    (nested jax.grad -> double AD).
    """
    interp = alpha * real + (1.0 - alpha) * fake

    def critic_sum(x: jax.Array) -> jax.Array:
        return jnp.sum(critic_apply(c_params, x))

    grads = jax.grad(critic_sum)(interp)
    flat = grads.reshape(grads.shape[0], -1)
    norms = jnp.sqrt(jnp.sum(flat * flat, axis=1) + eps)
    return jnp.mean(jnp.square(norms - 1.0))


def make_noise_injector(config: Config):
    """Stochastic-generator input prep (``Config.noise_channels``).

    Returns ``inject(rng, coarse) -> generator_input``: identity for the
    reference's deterministic generator, or the channel-concat of the
    coarse stack with ``noise_channels`` of iid N(0,1) drawn from ``rng``
    at the coarse resolution. The latent gives the GAN degrees of freedom
    for the unresolved small scales (probabilistic downscaling); losses,
    critic and metrics are computed on the generated field exactly as in
    the deterministic model.
    """
    k = config.noise_channels
    if k < 0:
        raise ValueError(f"noise_channels must be >= 0, got {k}")
    if not k:
        return lambda rng, coarse: coarse

    def inject(rng: jax.Array, coarse: jax.Array) -> jax.Array:
        b, h, w, _ = coarse.shape
        z = jax.random.normal(rng, (b, h, w, k), coarse.dtype)
        return jnp.concatenate([coarse, z], axis=-1)

    return inject


def eval_noise_rng(config: Config) -> jax.Array:
    """The FIXED noise key evaluation/plots/serving use for stochastic
    generators: one deterministic realization (seeded from config.seed),
    so epoch-over-epoch metrics and repeated requests compare like for
    like. Training draws fresh noise per step; ensembles fold member
    indices into this key."""
    return jax.random.fold_in(jax.random.PRNGKey(config.seed), 0x5e11)


def make_condition(config: Config):
    """Critic-input conditioning (``Config.critic_conditional``).

    Returns ``condition(x, coarse) -> critic_input``: identity for the
    reference's unconditional critic (networks/critic.py:9-106 never sees
    the covariates), or the channel-concat of ``x`` with the
    nearest-upsampled coarse stack for the conditional-critic variant.
    Real and fake share the SAME condition, so the GP interpolation of two
    conditioned inputs keeps the condition fixed (α·c + (1−α)·c = c) — the
    standard cGAN-GP formulation, with the gradient norm taken over the
    full conditioned input.
    """
    if not config.critic_conditional:
        return lambda x, coarse: x
    from downgan_tpu.models.layers import upsample_nearest

    factor = config.fine_size // config.coarse_size
    if factor * config.coarse_size != config.fine_size:
        raise ValueError(
            "critic_conditional requires fine_size to be an integer "
            f"multiple of coarse_size (got {config.fine_size}/"
            f"{config.coarse_size})")

    def condition(x: jax.Array, coarse: jax.Array) -> jax.Array:
        return jnp.concatenate(
            [x, upsample_nearest(coarse, factor).astype(x.dtype)], axis=-1)

    return condition


def _critic_pair_means(
    c_apply: Callable[[Any, jax.Array], jax.Array],
    c_params: Any,
    a: jax.Array,
    b: jax.Array,
    fused: bool,
) -> Tuple[jax.Array, jax.Array]:
    """Mean critic scores for two equal-size batches.

    With ``fused`` (hp.fused_critic_pass) the two independent critic
    forwards run as one concatenated 2B apply — on TPU ops execute one at
    a time, so this halves the critic's serial dispatch chain. Per-sample
    math is identical either way.
    """
    if fused:
        out = c_apply(c_params, jnp.concatenate([a, b], axis=0))
        n = a.shape[0]
        return jnp.mean(out[:n]), jnp.mean(out[n:])
    return jnp.mean(c_apply(c_params, a)), jnp.mean(c_apply(c_params, b))


def make_loss_fns(config: Config, gen: Generator, critic: Critic,
                  eof_components: Any = None):
    """Shared loss builders for both step variants.

    Returns ``(split_bands, critic_loss_fn, gen_loss_fn)``:
      * critic loss: E[C(fake)] - E[C(real)] + w_gp * GP (wasserstein.py:40-52);
      * generator loss: -gamma * E[C(fake)] + content_lambda * L1
        (wasserstein.py:74-78), in freq-sep mode split into high-pass
        adversarial / low-pass content bands (wasserstein_fs.py:37-88),
        plus the optional physics regularizers (divergence/vorticity,
        losses.py:119-193) and the EOF-projection term (losses.py:72-116):
        when ``hp.eof_lambda > 0``, ``eof_components`` must be the
        (>=ncomp, C, H*W) EOF stack fit from the training fine fields
        (``data.eof.fit_eofs_per_channel``); the leading ``hp.ncomp``
        components are used, consuming the reference's ncomp=75 knob
        (hyperparams.py:20).
    """
    hp = config.hp
    g_apply = gen.apply
    c_apply = critic.apply
    condition = make_condition(config)

    eof_comps = None
    if hp.eof_lambda:
        if eof_components is None:
            raise ValueError(
                "hp.eof_lambda > 0 requires eof_components (fit them from "
                "the training fine fields with data.eof.fit_eofs_per_channel)"
            )
        eof_comps = jnp.asarray(eof_components)[: hp.ncomp]

    def split_bands(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        lo = low_pass(x, hp.filter_size)
        return lo, x - lo

    def critic_loss_fn(
        c_params: Any, fake_in: jax.Array, real_in: jax.Array, alpha: jax.Array
    ) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
        c_real_mean, c_fake_mean = _critic_pair_means(
            c_apply, c_params, real_in, fake_in, hp.fused_critic_pass
        )
        gp = gradient_penalty(c_apply, c_params, real_in, fake_in, alpha)
        loss = c_fake_mean - c_real_mean + hp.effective_gp_weight * gp
        return loss, (c_real_mean, c_fake_mean)

    n_cov = config.n_covariates

    def gen_loss_fn(
        g_params: Any, c_params: Any, coarse: jax.Array, fine: jax.Array
    ) -> jax.Array:
        # ``coarse`` is the GENERATOR input (noise channels appended when
        # config.noise_channels > 0); the critic condition sees only the
        # true covariates (a full slice — elided by XLA — when noise is off).
        cov = coarse[..., :n_cov]
        fake = g_apply(g_params, coarse)
        if hp.freq_sep:
            fake_low, fake_high = split_bands(fake)
            real_low, _ = split_bands(fine)
            adv = -jnp.mean(c_apply(c_params, condition(fake_high, cov))) * hp.gamma
            content = hp.content_lambda * content_loss(fake_low, real_low)
        else:
            adv = -jnp.mean(c_apply(c_params, condition(fake, cov))) * hp.gamma
            content = hp.content_lambda * content_loss(fake, fine)
        loss = adv + content
        # optional physics regularizers (off at parity defaults)
        if hp.divergence_lambda:
            from downgan_tpu.ops.losses import divergence_loss

            loss = loss + hp.divergence_lambda * divergence_loss(fine, fake)
        if hp.vorticity_lambda:
            from downgan_tpu.ops.losses import vorticity_loss

            loss = loss + hp.vorticity_lambda * vorticity_loss(fine, fake)
        if hp.eof_lambda:
            from downgan_tpu.ops.losses import eof_loss

            loss = loss + hp.eof_lambda * eof_loss(eof_comps, fine, fake)
        return loss

    return split_bands, critic_loss_fn, gen_loss_fn


def _accum_value_and_grad(loss_fn, k: int, has_aux: bool):
    """``jax.value_and_grad`` over ``k`` equal microbatches of the leading
    batch axis, averaged (hp.grad_accum).

    All batch-positional args after ``params`` split on axis 0 into a
    (k, B/k, ...) stack and a ``lax.scan`` accumulates (loss, aux, grads),
    so only ONE microbatch's activations — in particular the gradient
    penalty's double-backward buffers, the peak of the step — are live at
    a time. Every core WGAN-GP loss term (Wasserstein means, GP, L1
    content) is a per-sample mean, so the average of the microbatch
    results equals the full-batch computation up to fp summation order.
    The divergence/vorticity/EOF regularizers normalize by a batch-wide
    std and therefore follow per-MICROBATCH normalization under
    accumulation (each microbatch's derived fields normalized by its own
    std; documented semantics, config.py HyperParams validation note) —
    the same estimator, differing from full-batch only through the
    sampling noise of the per-microbatch std. No reference equivalent:
    the reference is hard-capped at the batch one GPU can materialize.
    """
    vag = jax.value_and_grad(loss_fn, has_aux=has_aux)

    def split(x: jax.Array) -> jax.Array:
        b = x.shape[0]
        if b % k:
            raise ValueError(
                f"batch {b} does not divide into grad_accum={k} microbatches")
        return x.reshape(k, b // k, *x.shape[1:])

    def accum(params, *batch_args):
        mbs = tuple(split(a) for a in batch_args)
        first = tuple(m[0] for m in mbs)
        init = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype),
            jax.eval_shape(vag, params, *first),
        )

        def body(acc, mb):
            out = vag(params, *mb)
            return jax.tree.map(jnp.add, acc, out), None

        total, _ = lax.scan(body, init, mbs)
        return jax.tree.map(lambda x: x / k, total)

    return accum


def _ema_update(hp, ema: Any, new_params: Any) -> Any:
    """EMA of generator weights (hp.ema_decay; None passthrough when off)."""
    if not hp.ema_decay or ema is None:
        return ema
    d = hp.ema_decay
    return jax.tree.map(lambda e, p: d * e + (1.0 - d) * p, ema, new_params)


def g_updates_in_window(start_step: int, n_steps: int,
                        critic_iterations: int) -> int:
    """G updates the reference schedule performs over steps
    ``[start_step, start_step + n_steps)`` — the count of steps where
    ``step % critic_iterations == 0`` (``wasserstein.py:136``, including
    the G update at global step 0). The single source of truth for both
    the trainer's gen_loss rescaling and the bench FLOP census."""
    if n_steps <= 0:
        return 0
    n = critic_iterations
    first = -(-start_step // n) * n  # first multiple of n >= start_step
    last = (start_step + n_steps - 1) // n * n
    return max(0, (last - first) // n + 1)


def build_train_step(
    config: Config,
    gen: Generator,
    critic: Critic,
    with_metrics: bool = True,
    eof_components: Any = None,
) -> Callable[[GANTrainState, jax.Array, jax.Array, jax.Array], Tuple[GANTrainState, Metrics]]:
    """Builds the pure (un-jitted) WGAN-GP train step.

    Step semantics per batch (parity with ``wasserstein.py:120-148``):
      1. critic update (always): loss = E[C(fake)] - E[C(real)] + w_gp * GP
      2. generator update iff step % critic_iterations == 0:
         loss = -gamma * E[C(fake)] + content_lambda * L1(fake, fine)
      3. metric pass with the *post-update* params (MAE/MSE/MSSSIM/Wass),
         accumulated on device.
    In freq_sep mode the critic sees high-pass residuals and the content
    loss applies to the low-pass components (``wasserstein_fs.py:37-88``).
    """
    hp = config.hp
    tx = make_optimizer(config)

    g_apply = gen.apply
    c_apply = critic.apply
    condition = make_condition(config)
    inject = make_noise_injector(config)
    split_bands, critic_loss_fn, gen_loss_fn = make_loss_fns(
        config, gen, critic, eof_components=eof_components
    )

    augment = None
    if hp.augment_flips:
        from downgan_tpu.ops.augment import make_augment

        augment = make_augment(config)

    def train_step(
        state: GANTrainState, coarse: jax.Array, fine: jax.Array, rng: jax.Array
    ) -> Tuple[GANTrainState, Metrics]:
        alpha_rng = jax.random.fold_in(rng, state.step)
        if augment is not None:
            # Distinct stream from alpha's (fold_in twice) so the parity
            # path's alpha draws are untouched when augmentation is off.
            coarse, fine = augment(
                jax.random.fold_in(alpha_rng, 1), coarse, fine)
        alpha = jax.random.uniform(alpha_rng, (fine.shape[0], 1, 1, 1), jnp.float32)
        # Stochastic generator: fresh latent per G forward (distinct
        # streams for the critic-update fake, the G update, and the metric
        # pass). Identity when noise_channels == 0.
        noise_rng = jax.random.fold_in(alpha_rng, 2)

        # ---- critic update (gradients do not flow into G: stop_gradient)
        fake = lax.stop_gradient(
            g_apply(state.g_params,
                    inject(jax.random.fold_in(noise_rng, 0), coarse)))
        if hp.freq_sep:
            _, fake_c = split_bands(fake)
            _, real_c = split_bands(fine)
        else:
            fake_c, real_c = fake, fine
        fake_c, real_c = condition(fake_c, coarse), condition(real_c, coarse)
        if hp.grad_accum > 1:
            c_vag = _accum_value_and_grad(critic_loss_fn, hp.grad_accum,
                                          has_aux=True)
        else:
            c_vag = jax.value_and_grad(critic_loss_fn, has_aux=True)
        (c_loss, (c_real_mean, c_fake_mean)), c_grads = c_vag(
            state.c_params, fake_c, real_c, alpha)
        c_updates, c_opt_state = tx.update(c_grads, state.c_opt_state, state.c_params)
        c_params = optax.apply_updates(state.c_params, c_updates)

        # ---- generator update on the reference schedule (incl. step 0)
        def g_update(_: None):
            coarse_g = inject(jax.random.fold_in(noise_rng, 1), coarse)
            if hp.grad_accum > 1:
                g_loss, g_grads = _accum_value_and_grad(
                    lambda p, c, f: gen_loss_fn(p, c_params, c, f),
                    hp.grad_accum, has_aux=False,
                )(state.g_params, coarse_g, fine)
            else:
                g_loss, g_grads = jax.value_and_grad(gen_loss_fn)(
                    state.g_params, c_params, coarse_g, fine
                )
            g_updates, g_opt_state = tx.update(g_grads, state.g_opt_state, state.g_params)
            new_g = optax.apply_updates(state.g_params, g_updates)
            new_ema = _ema_update(hp, state.g_ema, new_g)
            return new_g, g_opt_state, new_ema, g_loss

        def g_skip(_: None):
            return (state.g_params, state.g_opt_state, state.g_ema,
                    jnp.zeros((), jnp.float32))

        g_params, g_opt_state, g_ema, g_loss = lax.cond(
            state.step % hp.critic_iterations == 0, g_update, g_skip, None
        )

        new_state = state.replace(
            step=state.step + 1,
            g_params=g_params,
            c_params=c_params,
            g_opt_state=g_opt_state,
            c_opt_state=c_opt_state,
            g_ema=g_ema,
        )

        metrics: Metrics = {
            "critic_loss": c_loss,
            "gen_loss": g_loss,
            "Wass": wass_loss(c_real_mean, c_fake_mean),
        }
        if with_metrics:
            # Parity with the per-batch metric pass (mlflow_epoch.py:53-63):
            # fresh fake from the post-update generator, post-update critic;
            # the metric set is the hp.metrics_to_calculate registry. The
            # metrics_reuse_fake fast path reuses the critic-update fake
            # (saves a third G forward per step).
            fake_m = fake if hp.metrics_reuse_fake else g_apply(
                g_params, inject(jax.random.fold_in(noise_rng, 2), coarse))
            for name, fn in resolve_metrics(hp.metrics_to_calculate).items():
                metrics[name] = fn(fine, fake_m)
            if "Wass" in hp.metrics_to_calculate:
                m_real, m_fake = _critic_pair_means(
                    c_apply, c_params, condition(fine, coarse),
                    condition(fake_m, coarse), hp.fused_critic_pass
                )
                metrics["Wass"] = wass_loss(m_real, m_fake)
        return new_state, metrics

    return train_step


def build_fused_round(
    config: Config,
    gen: Generator,
    critic: Critic,
    with_metrics: bool = True,
    eof_components: Any = None,
) -> Callable[[GANTrainState, jax.Array, jax.Array, jax.Array], Tuple[GANTrainState, Metrics]]:
    """SURVEY §7 fast path (b): one fused round = ``critic_iterations``
    critic updates on distinct minibatches + exactly one generator update.

    The parity path (:func:`build_train_step`) replicates the reference's
    ``num_steps % 5`` schedule with a ``lax.cond``; this variant is the
    textbook WGAN-GP inner loop (Gulrajani et al.) as one compiled program:
    a ``lax.scan`` over the n_critic minibatches, then the generator step.
    Inputs carry a leading n_critic axis: coarse (n, B, h, w, C),
    fine (n, B, H, W, P); the generator trains on the last minibatch.
    """
    hp = config.hp
    tx = make_optimizer(config)
    g_apply = gen.apply
    c_apply = critic.apply
    condition = make_condition(config)
    inject = make_noise_injector(config)
    split_bands, critic_loss_fn, gen_loss_fn = make_loss_fns(
        config, gen, critic, eof_components=eof_components
    )

    augment = None
    if hp.augment_flips:
        from downgan_tpu.ops.augment import make_augment

        augment = make_augment(config)

    def fused_round(
        state: GANTrainState, coarse_n: jax.Array, fine_n: jax.Array, rng: jax.Array
    ) -> Tuple[GANTrainState, Metrics]:
        if augment is not None:
            # One flip decision per sample across the whole round's
            # (n_critic, B) stack; pairs stay aligned.
            nc, b = coarse_n.shape[:2]
            c2, f2 = augment(
                jax.random.fold_in(jax.random.fold_in(rng, state.step), 1),
                coarse_n.reshape(nc * b, *coarse_n.shape[2:]),
                fine_n.reshape(nc * b, *fine_n.shape[2:]),
            )
            coarse_n = c2.reshape(coarse_n.shape)
            fine_n = f2.reshape(fine_n.shape)

        # Carry the last critic-iteration fake through the scan so the
        # metrics_reuse_fake fast path can skip the metric pass's G
        # forward (same one-update metric lag as the reference-schedule
        # fast path). Initialized with the generator's true output
        # shape/dtype (abstract eval — no compute).
        fake_shape = jax.eval_shape(
            lambda c: g_apply(state.g_params,
                              inject(jax.random.fold_in(rng, 0), c)),
            jax.ShapeDtypeStruct(coarse_n.shape[1:], coarse_n.dtype))
        fake0 = jnp.zeros(fake_shape.shape, fake_shape.dtype)

        def critic_body(carry, batch):
            c_params, c_opt_state, step, _ = carry
            coarse, fine = batch
            alpha = jax.random.uniform(
                jax.random.fold_in(rng, step), (fine.shape[0], 1, 1, 1), jnp.float32
            )
            fake = lax.stop_gradient(g_apply(
                state.g_params,
                inject(jax.random.fold_in(jax.random.fold_in(rng, step), 2),
                       coarse)))
            if hp.freq_sep:
                _, fake_c = split_bands(fake)
                _, real_c = split_bands(fine)
            else:
                fake_c, real_c = fake, fine
            fake_c, real_c = condition(fake_c, coarse), condition(real_c, coarse)
            if hp.grad_accum > 1:
                c_vag = _accum_value_and_grad(critic_loss_fn, hp.grad_accum,
                                              has_aux=True)
            else:
                c_vag = jax.value_and_grad(critic_loss_fn, has_aux=True)
            (c_loss, (c_real, c_fake)), grads = c_vag(
                c_params, fake_c, real_c, alpha)
            updates, c_opt_state = tx.update(grads, c_opt_state, c_params)
            c_params = optax.apply_updates(c_params, updates)
            return ((c_params, c_opt_state, step + 1, fake),
                    (c_loss, c_real, c_fake))

        ((c_params, c_opt_state, step, last_fake),
         (c_losses, c_reals, c_fakes)) = lax.scan(
            critic_body,
            (state.c_params, state.c_opt_state, state.step, fake0),
            (coarse_n, fine_n),
        )

        g_coarse, g_fine = coarse_n[-1], fine_n[-1]
        g_coarse_in = inject(jax.random.fold_in(jax.random.fold_in(rng, step), 3),
                             g_coarse)
        if hp.grad_accum > 1:
            g_loss, g_grads = _accum_value_and_grad(
                lambda p, c, f: gen_loss_fn(p, c_params, c, f),
                hp.grad_accum, has_aux=False,
            )(state.g_params, g_coarse_in, g_fine)
        else:
            g_loss, g_grads = jax.value_and_grad(gen_loss_fn)(
                state.g_params, c_params, g_coarse_in, g_fine
            )
        g_updates, g_opt_state = tx.update(g_grads, state.g_opt_state, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)
        g_ema = _ema_update(hp, state.g_ema, g_params)

        new_state = state.replace(
            step=step, g_params=g_params, c_params=c_params,
            g_opt_state=g_opt_state, c_opt_state=c_opt_state, g_ema=g_ema,
        )
        metrics: Metrics = {
            "critic_loss": jnp.mean(c_losses),
            "gen_loss": g_loss,
            "Wass": wass_loss(jnp.mean(c_reals), jnp.mean(c_fakes)),
        }
        if with_metrics:
            # metrics_reuse_fake: reuse the LAST critic-iteration fake
            # (pre-G-update params, same minibatch as the G update) —
            # drops the metric pass's G forward per round, metrics lag
            # one generator update, exactly like the reference-schedule
            # fast path (build_train_step).
            fake_m = last_fake if hp.metrics_reuse_fake else g_apply(
                g_params, inject(
                    jax.random.fold_in(jax.random.fold_in(rng, step), 4),
                    g_coarse))
            for name, fn in resolve_metrics(hp.metrics_to_calculate).items():
                metrics[name] = fn(g_fine, fake_m)
            if "Wass" in hp.metrics_to_calculate:
                m_real, m_fake = _critic_pair_means(
                    c_apply, c_params, condition(g_fine, g_coarse),
                    condition(fake_m, g_coarse), hp.fused_critic_pass
                )
                metrics["Wass"] = wass_loss(m_real, m_fake)
        return new_state, metrics

    return fused_round


def build_eval_metrics(
    config: Config, gen: Generator, critic: Critic
) -> Callable[[GANTrainState, jax.Array, jax.Array], Metrics]:
    """Test-set metric pass (parity with wasserstein.py:157-169): per batch,
    generate fake and compute the metric registry, no parameter updates."""

    hp = config.hp
    condition = make_condition(config)
    inject = make_noise_injector(config)
    fixed_rng = eval_noise_rng(config)

    def eval_metrics(state: GANTrainState, coarse: jax.Array, fine: jax.Array) -> Metrics:
        # Stochastic generators evaluate on ONE fixed noise realization
        # (eval_noise_rng) so the test pass is deterministic and epoch
        # metrics compare like for like.
        fake = gen.apply(state.g_params, inject(fixed_rng, coarse))
        out: Metrics = {}
        for name, fn in resolve_metrics(hp.metrics_to_calculate).items():
            out[name] = fn(fine, fake)
        if "Wass" in hp.metrics_to_calculate:
            c_real_mean, c_fake_mean = _critic_pair_means(
                critic.apply, state.c_params, condition(fine, coarse),
                condition(fake, coarse), hp.fused_critic_pass
            )
            out["Wass"] = wass_loss(c_real_mean, c_fake_mean)
        return out

    return eval_metrics


def build_eval_metrics_pair(
    config: Config, gen: Generator, critic: Critic
) -> Callable[[GANTrainState, jax.Array, jax.Array], Metrics]:
    """Score the live AND the EMA generator on the same batch in ONE
    program (Trainer best-tracking with ``hp.ema_decay`` on): shares the
    batch gathers and the per-epoch dispatch that two separate full test
    passes would otherwise pay. EMA values come back under ``<name>__ema``
    keys; requires ``state.g_ema`` to be populated."""
    eval_fn = build_eval_metrics(config, gen, critic)

    def pair(state: GANTrainState, coarse: jax.Array, fine: jax.Array) -> Metrics:
        out: Metrics = dict(eval_fn(state, coarse, fine))
        ema_state = state.replace(g_params=state.g_ema)
        for k, v in eval_fn(ema_state, coarse, fine).items():
            out[k + "__ema"] = v
        return out

    return pair


def build_eval_scan(
    config: Config, gen: Generator, critic: Critic, pair: bool = False
) -> Callable[..., Metrics]:
    """Whole-test-set metric pass as one compiled program (the reference
    iterates batches on the host, ``wasserstein.py:157-169``): lax.scan of
    :func:`build_eval_metrics` over a (n_steps, batch) index matrix into
    the device-resident test set, returning per-batch metric stacks.
    ``pair=True`` scans :func:`build_eval_metrics_pair` instead."""
    eval_fn = (build_eval_metrics_pair if pair else build_eval_metrics)(
        config, gen, critic)

    def eval_scan(
        state: GANTrainState,
        coarse_all: jax.Array,
        fine_all: jax.Array,
        perm: jax.Array,
    ) -> Metrics:
        def body(carry, idx):
            coarse = jnp.take(coarse_all, idx, axis=0)
            fine = jnp.take(fine_all, idx, axis=0)
            return carry, eval_fn(state, coarse, fine)

        _, stacked = lax.scan(body, None, perm)
        return stacked

    return eval_scan


def build_epoch_scan(
    config: Config,
    gen: Generator,
    critic: Critic,
    with_metrics: bool = True,
    eof_components: Any = None,
) -> Callable[..., Tuple[GANTrainState, Metrics]]:
    """One compiled program per epoch: lax.scan of the train step over
    permutation indices into the device-resident dataset.

    ``perm``: (n_steps, batch) int32 indices into axis 0 of coarse_all /
    fine_all (drop-last semantics — SURVEY §7 'static shapes'), or
    (n_rounds, critic_iterations, batch) under the "fused" schedule.
    Batches are gathered on device inside the scan body, so the host never
    touches the data during an epoch. Metrics come back stacked per scan
    iteration; the epoch mean is one reduction at the end.
    """
    if config.hp.schedule == "fused":
        step_fn = build_fused_round(config, gen, critic, with_metrics=with_metrics,
                                    eof_components=eof_components)
    else:
        step_fn = build_train_step(config, gen, critic, with_metrics=with_metrics,
                                   eof_components=eof_components)

    def epoch_fn(
        state: GANTrainState,
        coarse_all: jax.Array,
        fine_all: jax.Array,
        perm: jax.Array,
        rng: jax.Array,
    ) -> Tuple[GANTrainState, Metrics]:
        def body(carry: GANTrainState, idx: jax.Array) -> Tuple[GANTrainState, Metrics]:
            coarse = jnp.take(coarse_all, idx, axis=0)
            fine = jnp.take(fine_all, idx, axis=0)
            return step_fn(carry, coarse, fine, rng)

        state, stacked = lax.scan(body, state, perm)
        return state, stacked

    return epoch_fn
