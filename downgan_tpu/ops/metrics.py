"""Metric registry (parity with ``DoWnGAN/config/hyperparams.py:38-43``).

The reference maps metric names to loss callables in a dict consumed by
the per-batch/per-epoch logging path (``mlflow_tools/mlflow_epoch.py``).
Here the registry maps names to pure ``f(real, fake) -> scalar`` JAX
functions; the trainer resolves ``hp.metrics_to_calculate`` through it
inside the jitted step, so adding a metric is one registry entry.
``Wass`` is computed from critic outputs in the train step itself (it
needs the critic, not just the fields).
"""
from __future__ import annotations

from typing import Callable, Dict

import jax

from downgan_tpu.ops.losses import (
    content_loss,
    content_mse_loss,
    divergence_loss,
    vorticity_loss,
)
from downgan_tpu.ops.msssim import msssim_metric
from downgan_tpu.ops.spectral import ralsd

FieldMetric = Callable[[jax.Array, jax.Array], jax.Array]

# name -> f(real, fake). "Wass" is special-cased in the train step.
METRIC_REGISTRY: Dict[str, FieldMetric] = {
    "MAE": content_loss,
    "MSE": content_mse_loss,
    "MSSSIM": msssim_metric,
    "Divergence": divergence_loss,
    "Vorticity": vorticity_loss,
    "RALSD": lambda real, fake: ralsd(fake, real),
}


def resolve_metrics(names) -> Dict[str, FieldMetric]:
    unknown = [n for n in names if n != "Wass" and n not in METRIC_REGISTRY]
    if unknown:
        raise KeyError(f"unknown metrics {unknown}; registry has {sorted(METRIC_REGISTRY)}")
    return {n: METRIC_REGISTRY[n] for n in names if n != "Wass"}
