"""Experiment setup utilities (parity with ``DoWnGAN/mlflow_tools/mlflow_utils.py``).

* :func:`log_hyperparams` — log every hyperparameter of the config
  (the reference reflects over the hyperparams module with ``dir()``,
  ``mlflow_utils.py:5-10``; here the dataclass fields are the registry).
* :func:`define_experiment` — pick or create an experiment. The reference
  is interactive-stdin only (``mlflow_utils.py:13-42``); this version is
  non-interactive by default (name argument) with an opt-in interactive
  picker for CLI parity.
* :func:`write_tags` — attach a run-description tag
  (``mlflow_utils.py:44-50``).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

from downgan_tpu.config.config import Config, HyperParams
from downgan_tpu.tracking.store import Run, TrackingStore


def hyperparams_dict(config: Config) -> Dict[str, Any]:
    """Flat param dict: every HyperParams field + the workload shape."""
    out: Dict[str, Any] = {}
    for f in dataclasses.fields(HyperParams):
        out[f.name] = getattr(config.hp, f.name)
    for key in (
        "region", "scale_factor", "coarse_size", "fine_size",
        "n_covariates", "n_predictands", "filters", "num_res_blocks", "seed",
    ):
        out[key] = getattr(config, key)
    return out


def log_hyperparams(run: Run, config: Config) -> None:
    run.log_params(hyperparams_dict(config))


def define_experiment(
    store: TrackingStore,
    name: Optional[str] = None,
    interactive: bool = False,
    tag: Optional[str] = None,
) -> str:
    """Return an experiment id; create it if needed.

    With ``interactive=True`` (reference behavior), list the existing
    experiments on stdout and prompt on stdin for a selection or new name.
    """
    if interactive and name is None:
        existing = store.experiments()
        print("Which experiment would you like to use?")
        for exp_id, info in existing.items():
            print(f"  [{exp_id}] {info['name']}")
        choice = input("Enter an id, or a new experiment name: ").strip()
        if choice in existing:
            return choice
        name = choice
    if name is None:
        raise ValueError("experiment name required in non-interactive mode")
    return store.create_experiment(name, tags={"mlflow.note.content": tag} if tag else None)


def write_tags(run: Run, description: Optional[str] = None, interactive: bool = False) -> None:
    if interactive and description is None:
        description = input("Provide a description of the run: ").strip()
    if description:
        run.set_tags({"description": description})
