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

# Heavy convenience symbols (orbax / matplotlib chains) resolve lazily
# (PEP 562) so `import downgan_tpu` costs only the jax/flax baseline.
_LAZY = {
    "Trainer": ("downgan_tpu.training.trainer", "Trainer"),
    "TrackingStore": ("downgan_tpu.tracking", "TrackingStore"),
    "define_experiment": ("downgan_tpu.tracking", "define_experiment"),
    "CheckpointManager": ("downgan_tpu.utils.checkpoint", "CheckpointManager"),
    "generate_fields": ("downgan_tpu.inference", "generate_fields"),
    "restore_generator_params": ("downgan_tpu.inference", "restore_generator_params"),
    "write_generated_netcdf": ("downgan_tpu.inference", "write_generated_netcdf"),
}


def __getattr__(name: str):
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        value = getattr(importlib.import_module(module), attr)
        globals()[name] = value
        return value
    raise AttributeError(f"module 'downgan_tpu' has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_LAZY))
