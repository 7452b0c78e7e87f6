"""Parallelism layer: device mesh, shardings, data-parallel train step.

The reference is single-GPU (``DoWnGAN/config/config.py:25`` hard-codes
``cuda:0``; SURVEY §2 parallelism inventory) — this subsystem is the
TPU-native addition that scales the same workload over an ICI-connected
slice via ``jax.sharding`` + GSPMD collectives.
"""
from downgan_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
from downgan_tpu.parallel.dp import build_dp_train_step, build_dp_epoch_scan
from downgan_tpu.parallel.spatial import (
    build_spatial_train_step,
    halo_exchange,
    make_sharded_conv,
    sharded_critic_apply,
    sharded_generator_apply,
    tiled_sr_inference,
)

__all__ = [
    "DATA_AXIS",
    "batch_sharding",
    "make_mesh",
    "replicated",
    "shard_batch",
    "build_dp_train_step",
    "build_dp_epoch_scan",
    "build_spatial_train_step",
    "halo_exchange",
    "make_sharded_conv",
    "sharded_critic_apply",
    "sharded_generator_apply",
    "tiled_sr_inference",
]
