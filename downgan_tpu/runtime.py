"""Runtime initialization: persistent compilation cache + platform setup.

The workload's jitted programs (fused WGAN-GP step, whole-epoch scan) are
large — first TPU compile is minutes. A persistent XLA compilation cache
makes every later process start sub-second for unchanged programs. The
reference has no equivalent (PyTorch eager); this is pure TPU-runtime
ergonomics, called by the CLI, the benchmark, and the driver entry.

Env knobs: ``DOWNGAN_CACHE_DIR`` (default ``~/.cache/downgan_tpu/xla``;
set empty to disable).
"""
from __future__ import annotations

import os

import jax

_DONE = False


def setup_cache(cache_dir: str | None = None) -> str | None:
    """Enable the persistent compilation cache. Idempotent; returns the
    cache dir in use (None if disabled)."""
    global _DONE
    if cache_dir is None:
        cache_dir = os.environ.get(
            "DOWNGAN_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "downgan_tpu", "xla"),
        )
    if not cache_dir:
        return None
    if _DONE:
        return cache_dir
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache everything that took meaningful time; entry size unlimited.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _DONE = True
    return cache_dir
