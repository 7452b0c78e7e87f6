"""Experiment tracking: an MLflow-style local filesystem tracker.

The reference logs to an MLflow server (``DoWnGAN/mlflow_tools/``); mlflow
is not in this environment, so this package provides an API-compatible
local tracker: experiments / runs / params / metrics / tags / artifacts
persisted as plain files, a per-run CSV metric sink, and a stdlib HTTP
viewer (``downgan_tpu.tracking.server``) standing in for ``mlflow server``
(``mlflow_tools/mlflow_server_cmd.py:1-4``).
"""
from downgan_tpu.tracking.store import Run, TrackingStore
from downgan_tpu.tracking.experiment import (
    define_experiment,
    hyperparams_dict,
    log_hyperparams,
    write_tags,
)

__all__ = [
    "Run",
    "TrackingStore",
    "define_experiment",
    "hyperparams_dict",
    "log_hyperparams",
    "write_tags",
]
