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

_ACTIVE_DIR: str | None = None
_DONE = False


def setup_cache(cache_dir: str | None = None) -> str | None:
    """Enable the persistent compilation cache. Idempotent; returns the
    cache dir ACTUALLY in use (None if disabled) — a second call with a
    different directory cannot move an already-configured cache, so it
    returns the first directory rather than pretending the new one took
    effect."""
    global _ACTIVE_DIR, _DONE
    if _DONE:
        return _ACTIVE_DIR
    if cache_dir is None:
        cache_dir = os.environ.get(
            "DOWNGAN_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "downgan_tpu", "xla"),
        )
    if not cache_dir:
        _DONE = True  # explicit disable is also a decision; keep it
        return None
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache everything that took meaningful time; entry size unlimited.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _ACTIVE_DIR = cache_dir
    _DONE = True
    return cache_dir
