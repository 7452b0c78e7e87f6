"""downgan_tpu — a TPU-native super-resolution GAN framework.

A ground-up JAX/Flax/XLA re-design of the capabilities of nannau/DoWnGAN
(WGAN-GP super-resolution downscaling of climate wind fields): ESRGAN-style
RRDB generator, VGG-style critic, WGAN-GP training with gradient penalty,
NetCDF climate-data pipeline, experiment tracking, checkpoint/resume, and
data-parallel scaling over a `jax.sharding.Mesh`.

Design: functional core / imperative shell. All compute lives in pure,
jitted functions operating on NHWC bf16/f32 arrays; Python owns only I/O,
config and the epoch loop. See ``downgan_tpu.training.wgan`` for the fused
train step and ``downgan_tpu.parallel.mesh`` for the device-mesh story.
"""

__version__ = "0.1.0"

from downgan_tpu.config.config import Config, HyperParams, RegionBox, REGIONS  # noqa: F401
from downgan_tpu.training.trainer import Trainer  # noqa: F401
from downgan_tpu.tracking import TrackingStore, define_experiment  # noqa: F401
from downgan_tpu.utils.checkpoint import CheckpointManager  # noqa: F401
from downgan_tpu.inference import generate_fields, restore_generator_params, write_generated_netcdf  # noqa: F401
