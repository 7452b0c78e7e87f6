"""Data-parallel WGAN-GP training over a device mesh.

The whole fused train step (5-critic/1-generator schedule, nested-grad
gradient penalty, on-device metrics — ``downgan_tpu/training/wgan.py``)
is jitted once with GSPMD shardings:

  * train state (params + both Adam states): **replicated**;
  * batch (coarse, fine): **sharded on the leading axis** over the
    ``data`` mesh axis.

Per-device loss terms are means over local rows; because the state is
replicated and the loss is a mean over a sharded axis, GSPMD inserts the
gradient all-reduce (psum over ICI) automatically — no NCCL-style
choreography (the reference has none to begin with: single ``cuda:0``,
``DoWnGAN/config/config.py:25``).

The epoch path keeps the dataset device-resident (replicated — matching
the reference's whole-set-on-GPU residency, ``GAN/stage.py:28-31``) and
gathers batches inside the compiled epoch scan; a
``with_sharding_constraint`` re-shards each gathered batch onto the data
axis so every step runs data-parallel with zero host involvement.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from downgan_tpu.config.config import Config
from downgan_tpu.models.critic import Critic
from downgan_tpu.models.generator import Generator
from downgan_tpu.parallel.mesh import DATA_AXIS, batch_sharding, replicated
from downgan_tpu.training.state import GANTrainState
from downgan_tpu.training.wgan import Metrics, build_fused_round, build_train_step


def _step_builder(config: Config):
    """Reference schedule vs fused n-critic rounds (hp.schedule). Fused
    inputs carry a leading n_critic axis, so the batch axis moves to 1."""
    if config.hp.schedule == "fused":
        return build_fused_round, 5, 1
    return build_train_step, 4, 0


def build_dp_train_step(
    config: Config,
    gen: Generator,
    critic: Critic,
    mesh: Mesh,
    with_metrics: bool = True,
    donate_state: bool = True,
    eof_components=None,
) -> Callable[[GANTrainState, jax.Array, jax.Array, jax.Array], Tuple[GANTrainState, Metrics]]:
    """Jit the fused train step with DP shardings over ``mesh``."""
    builder, ndim, batch_axis = _step_builder(config)
    step_fn = builder(config, gen, critic, with_metrics=with_metrics,
                      eof_components=eof_components)
    rep = replicated(mesh)
    bat = batch_sharding(mesh, ndim=ndim, batch_axis=batch_axis)
    return jax.jit(
        step_fn,
        in_shardings=(rep, bat, bat, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,) if donate_state else (),
    )


def build_dp_epoch_scan(
    config: Config,
    gen: Generator,
    critic: Critic,
    mesh: Mesh,
    with_metrics: bool = True,
    donate_state: bool = True,
    eof_components=None,
) -> Callable[..., Tuple[GANTrainState, Metrics]]:
    """One compiled DP program per epoch.

    ``coarse_all`` / ``fine_all`` live replicated in HBM; ``perm`` is the
    (n_steps, batch) index matrix. Each scan step gathers its batch
    locally (slicing a replicated array is a local operation) and the
    sharding constraint splits it over the data axis for the step.
    """
    builder, ndim, batch_axis = _step_builder(config)
    train_step = builder(config, gen, critic, with_metrics=with_metrics,
                         eof_components=eof_components)
    spec = [None] * ndim
    spec[batch_axis] = DATA_AXIS
    bat_spec = P(*spec)

    def epoch_fn(
        state: GANTrainState,
        coarse_all: jax.Array,
        fine_all: jax.Array,
        perm: jax.Array,
        rng: jax.Array,
    ) -> Tuple[GANTrainState, Metrics]:
        def body(carry: GANTrainState, idx: jax.Array):
            coarse = lax.with_sharding_constraint(
                jnp.take(coarse_all, idx, axis=0), NamedSharding(mesh, bat_spec)
            )
            fine = lax.with_sharding_constraint(
                jnp.take(fine_all, idx, axis=0), NamedSharding(mesh, bat_spec)
            )
            return train_step(carry, coarse, fine, rng)

        return lax.scan(body, state, perm)

    rep = replicated(mesh)
    return jax.jit(
        epoch_fn,
        in_shardings=(rep, rep, rep, rep, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,) if donate_state else (),
    )
