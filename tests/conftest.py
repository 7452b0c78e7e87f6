"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-device data parallelism is tested without TPU hardware by forcing
the host platform to expose 8 devices (SURVEY §4 'implication for the
rebuild'). XLA_FLAGS must be set before jax initializes its backends; the
platform override must go through jax.config (the environment pre-sets
JAX_PLATFORMS to the TPU plugin, which would win over the env var).
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
