"""Orbax checkpointing of the FULL train state — and a real resume path.

The reference persists model weights only, every epoch, through MLflow
(``DoWnGAN/mlflow_tools/mlflow_epoch.py:65-69``) and has **no resume**: a
crash loses both Adam states and the step counter (SURVEY §5). Here the
whole :class:`~downgan_tpu.training.state.GANTrainState` (G/C params, both
optimizer states, step) checkpoints atomically via Orbax, with retention,
async-friendly layout, and restore that reproduces training bit-for-bit
from the saved step.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp

from downgan_tpu.training.state import GANTrainState


class CheckpointManager:
    """Thin wrapper around ``ocp.CheckpointManager`` for GANTrainState.

    ``max_to_keep=None`` retains every epoch — the reference's behavior
    (it logs model artifacts for EVERY epoch,
    ``mlflow_tools/mlflow_epoch.py:65-69``, which is what lets
    ``gen_fake_ds.py -e`` load arbitrary epochs); ``keep_period=k``
    additionally pins every k-th step outside the rolling window."""

    def __init__(self, directory: str, max_to_keep: Optional[int] = 3,
                 save_interval_steps: int = 1,
                 keep_period: Optional[int] = None):
        self._mngr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval_steps,
                keep_period=keep_period,
                create=True,
            ),
        )

    def save(self, step: int, state: GANTrainState, force: bool = False) -> bool:
        saved = self._mngr.save(
            step, args=ocp.args.StandardSave(state), force=force
        )
        return bool(saved)

    def restore(self, target: GANTrainState, step: Optional[int] = None) -> GANTrainState:
        """Restore into the structure of ``target`` (an abstract or concrete
        state built by ``create_state``)."""
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        retained = list(self.all_steps())
        if retained and step not in retained:
            raise FileNotFoundError(
                f"epoch/step {step} is not among the retained checkpoints "
                f"{sorted(retained)}. The default retention keeps a rolling "
                "window of 3 full train states; train with "
                "Config.max_checkpoints=0 (keep every epoch, the reference's "
                "behavior) or keep_checkpoint_every=k to make older epochs "
                "restorable.")
        return self._mngr.restore(step, args=ocp.args.StandardRestore(target))

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def all_steps(self):
        return self._mngr.all_steps()

    def wait(self) -> None:
        self._mngr.wait_until_finished()

    def close(self) -> None:
        self._mngr.close()


def save_params(path: str, params: Any) -> None:
    """One-shot weights-only save (the analogue of the reference's
    per-epoch ``log_state_dict``, for inference artifacts)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()
    ckptr.close()


def load_params(path: str, target: Any = None) -> Any:
    ckptr = ocp.StandardCheckpointer()
    out = ckptr.restore(os.path.abspath(path), target)
    ckptr.close()
    return out
