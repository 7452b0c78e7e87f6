"""TensorBoard metric/image sink (parity with the legacy TensorBoard path,
``DoWnGAN/mlflow_tools/gen_plots.py:43-72`` ``plot_to_tensorboard``).

Optional: activates only when ``tensorboardX`` is importable. Logs scalar
metrics per epoch and the coarse/fake/real comparison figure as an image
tensor, alongside (not instead of) the filesystem tracker.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

try:
    from tensorboardX import SummaryWriter

    HAVE_TENSORBOARD = True
except ImportError:  # pragma: no cover - tensorboardX is in this env
    SummaryWriter = None
    HAVE_TENSORBOARD = False


def fig_to_array(fig) -> np.ndarray:
    """Rasterize a matplotlib figure to (3, H, W) uint8 (the CHW layout
    TensorBoard's image API expects — reference ``gen_plots.py:43-72``)."""
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
    return np.transpose(buf, (2, 0, 1))


class TensorBoardSink:
    """Thin epoch-metric/image writer. No-op when tensorboardX is absent."""

    def __init__(self, logdir: str):
        self._writer = SummaryWriter(logdir) if HAVE_TENSORBOARD else None

    def log_metrics(self, metrics: Dict[str, float], step: int) -> None:
        if self._writer is None:
            return
        for key, value in metrics.items():
            self._writer.add_scalar(key, float(value), step)

    def log_figure(self, tag: str, fig, step: int) -> None:
        if self._writer is None:
            return
        self._writer.add_image(tag, fig_to_array(fig), step)

    def log_image_array(self, tag: str, chw: np.ndarray, step: int) -> None:
        if self._writer is None:
            return
        self._writer.add_image(tag, chw, step)

    def flush(self) -> None:
        if self._writer is not None:
            self._writer.flush()

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()
