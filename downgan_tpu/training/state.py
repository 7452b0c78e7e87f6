"""GAN training state: both networks' params, both Adam states, step counter.

Re-designed from the reference's scattered mutable state (two torch
``nn.Module``s + two ``torch.optim.Adam`` objects + a Python ``num_steps``
counter, ``DoWnGAN/GAN/stage.py:59-64`` and ``wasserstein.py:24``) into a
single immutable pytree that a pure jitted train step threads through — so
the whole of training state checkpoints atomically (an upgrade over the
reference, which persists weights only and cannot resume: SURVEY §5).
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from downgan_tpu.config.config import Config
from downgan_tpu.models.critic import Critic
from downgan_tpu.models.generator import Generator


class GANTrainState(struct.PyTreeNode):
    step: jax.Array  # int32 scalar; parity with wasserstein.py:24 num_steps
    g_params: Any
    c_params: Any
    g_opt_state: Any
    c_opt_state: Any
    # EMA of g_params when hp.ema_decay > 0, else None (absent from the
    # pytree). The sampling/serving weights in production GAN practice.
    g_ema: Any = None

    def replace_params(self, g_params: Any = None, c_params: Any = None) -> "GANTrainState":
        return self.replace(
            g_params=self.g_params if g_params is None else g_params,
            c_params=self.c_params if c_params is None else c_params,
        )


def make_models(config: Config) -> Tuple[Any, Critic]:
    dtype = jnp.bfloat16 if config.hp.compute_dtype == "bfloat16" else jnp.float32
    if config.generator_arch == "srresnet":
        from downgan_tpu.models.generator import SRResNetGenerator

        gen = SRResNetGenerator(
            filters=config.filters,
            n_predictands=config.n_predictands,
            num_res_blocks=config.num_res_blocks,
            num_upsample=config.num_upsample,
            dtype=dtype,
        )
    elif config.generator_arch == "rrdb":
        gen = Generator(
            filters=config.filters,
            n_predictands=config.n_predictands,
            num_res_blocks=config.num_res_blocks,
            num_upsample=config.num_upsample,
            dtype=dtype,
            remat=config.hp.remat,
        )
    else:
        raise ValueError(f"unknown generator_arch {config.generator_arch!r}")
    critic = Critic(base=config.filters, fine_size=config.fine_size, dtype=dtype)
    return gen, critic


def lr_schedule_fn(hp) -> optax.Schedule:
    """LR schedule from the hp knobs (steps = per-network optimizer
    updates). Constant is the reference parity default (stage.py:63-64);
    cosine/linear decay `lr` -> `lr * lr_final_factor` over
    `lr_decay_steps` after `lr_warmup_steps` of linear warmup from 0."""
    if hp.lr_schedule == "constant":
        if hp.lr_warmup_steps:
            return optax.join_schedules(
                [optax.linear_schedule(0.0, hp.lr, hp.lr_warmup_steps),
                 optax.constant_schedule(hp.lr)],
                [hp.lr_warmup_steps],
            )
        return optax.constant_schedule(hp.lr)
    end = hp.lr * hp.lr_final_factor
    if hp.lr_schedule == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, hp.lr, hp.lr_warmup_steps, hp.lr_decay_steps, end_value=end)
    decay = optax.linear_schedule(
        hp.lr, end, hp.lr_decay_steps - hp.lr_warmup_steps)
    if hp.lr_warmup_steps:
        return optax.join_schedules(
            [optax.linear_schedule(0.0, hp.lr, hp.lr_warmup_steps), decay],
            [hp.lr_warmup_steps],
        )
    return decay


def make_optimizer(config: Config) -> optax.GradientTransformation:
    """Adam(lr=2.5e-4, betas=(0.9, 0.99)) — reference stage.py:63-64.

    torch Adam and optax.adam share the same update rule (eps outside the
    sqrt bias correction differs only at eps-scale; both use 1e-8). The
    LR follows :func:`lr_schedule_fn`; the schedule's count is the Adam
    state's update counter, so each network (G updates 1-in-n_critic
    steps) advances its own schedule and checkpoint resume is exact.
    """
    hp = config.hp
    if hp.lr_schedule == "constant" and not hp.lr_warmup_steps:
        # Plain float LR keeps the stateless scale transform — the
        # opt_state pytree (and existing checkpoints) of parity configs
        # stay unchanged; a schedule adds a ScaleBySchedule count leaf.
        return optax.adam(hp.lr, b1=hp.beta1, b2=hp.beta2, eps=1e-8)
    return optax.adam(lr_schedule_fn(hp), b1=hp.beta1, b2=hp.beta2, eps=1e-8)


def create_state(config: Config, rng: jax.Array) -> GANTrainState:
    gen, critic = make_models(config)
    g_rng, c_rng = jax.random.split(rng)
    # generator_in_channels folds in the stochastic noise channels
    # (config.noise_channels); critic_in_channels the upsampled covariate
    # stack when the conditional critic is on (config.critic_conditional).
    coarse_shape = (1, config.coarse_size, config.coarse_size,
                    config.generator_in_channels)
    fine_shape = (1, config.fine_size, config.fine_size, config.critic_in_channels)
    g_params = gen.init(g_rng, jnp.zeros(coarse_shape, jnp.float32))
    c_params = critic.init(c_rng, jnp.zeros(fine_shape, jnp.float32))
    tx = make_optimizer(config)
    return GANTrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params,
        c_params=c_params,
        g_opt_state=tx.init(g_params),
        c_opt_state=tx.init(c_params),
        g_ema=jax.tree.map(jnp.copy, g_params) if config.hp.ema_decay else None,
    )


def param_count(params: Any) -> int:
    return sum(int(jnp.size(x)) for x in jax.tree.leaves(params))
