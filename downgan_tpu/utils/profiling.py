"""Profiling and numeric-anomaly tooling (SURVEY §5 "tracing/profiling").

The reference's only artifacts here are a globally-enabled
``torch.autograd.set_detect_anomaly(True)`` (``DoWnGAN/GAN/wasserstein.py:13``
— a permanent silent slowdown) and a per-epoch CUDA memory print in the
bit-rotted FS trainer. TPU-native replacements, all opt-in:

* :func:`trace` — ``jax.profiler`` trace context writing TensorBoard-
  compatible profiles (xplane) for a training window;
* :func:`annotate` — named trace spans for host-side phases;
* :func:`detect_anomalies` — scoped ``jax_debug_nans``/``jax_debug_infs``
  (the reference's anomaly mode, but scoped instead of global);
* :func:`device_memory_stats` — live HBM usage per device (the
  ``memory_summary`` analogue).
"""
from __future__ import annotations

import contextlib
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Profile everything in the block to ``logdir`` (TensorBoard format)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span visible in the profiler timeline (host + device)."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def detect_anomalies(nans: bool = True, infs: bool = False) -> Iterator[None]:
    """Raise on NaN/Inf production inside jitted code, scoped to the block."""
    prev_nans = jax.config.jax_debug_nans
    prev_infs = jax.config.jax_debug_infs
    jax.config.update("jax_debug_nans", nans)
    jax.config.update("jax_debug_infs", infs)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev_nans)
        jax.config.update("jax_debug_infs", prev_infs)


def device_memory_stats(device: Optional[jax.Device] = None) -> Dict[str, int]:
    """Per-device allocator stats (bytes). Empty dict if the backend does
    not expose them (CPU)."""
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    return dict(stats) if stats else {}
