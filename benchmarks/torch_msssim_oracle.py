"""Independent torch-side MS-SSIM oracle (VERDICT r4 #3).

The reference's structural metric IS ``pytorch_msssim.MS_SSIM(win_size=7,
data_range=1, channel=2)`` wrapped in batch-global per-channel min-max
normalization (``/root/reference/DoWnGAN/GAN/losses.py:12-38``).
pytorch_msssim itself is not installed here (and pip is forbidden), so
until this module existed every cross-check of ``downgan_tpu.ops.msssim``
ran against oracles written by the same author from the same reading of
the conventions — a systematic shared misreading would have passed every
test.

This oracle breaks that loop: a from-scratch torch implementation of
pytorch_msssim's documented conventions, executed by torch's own conv2d /
avg_pool2d kernels (a different numeric backend from both scipy and XLA):

  * separable 1-D gaussian window (``coords - size//2``, sigma 1.5),
    depthwise (groups=C) VALID convolution along H then W;
  * K = (0.01, 0.03), C_i = (K_i * data_range)**2;
  * per-channel means of the ssim/cs maps (``flatten(2).mean(-1)``);
  * relu-clamped cs at every non-final scale and relu-clamped final ssim;
  * between scales, ``F.avg_pool2d(kernel_size=2, padding=[H%2, W%2])`` —
    torch's implicit symmetric zero-pad with count_include_pad, whose
    bottom/right pad element never enters a stride-2 window;
  * 5 scale weights (0.0448, 0.2856, 0.3001, 0.2363, 0.1333), product of
    ``stack ** w`` over scales, mean over (batch, channel).

``reference_msssim_metric`` adds the reference's exact normalization
semantics (per-channel min/max over the WHOLE batch, both inputs
independently — functional, unlike the reference's in-place mutation).

Used by tests/test_msssim.py (cross-check of the JAX op on 128 px
2-channel fields, structured fields, odd sizes, and the normalization
path) and by benchmarks/adam_equivalence.py (a measuring stick the JAX
side did not define).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
import torch
import torch.nn.functional as F

MS_WEIGHTS: Tuple[float, ...] = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _gaussian_1d(win_size: int, sigma: float) -> torch.Tensor:
    coords = torch.arange(win_size, dtype=torch.float32) - win_size // 2
    g = torch.exp(-(coords ** 2) / (2.0 * sigma ** 2))
    return g / g.sum()


def _gaussian_filter(x: torch.Tensor, win: torch.Tensor) -> torch.Tensor:
    """Separable depthwise gaussian blur, VALID padding, NCHW."""
    c = x.shape[1]
    k = win.numel()
    kern_h = win.view(1, 1, k, 1).expand(c, 1, k, 1).to(x.dtype)
    kern_w = win.view(1, 1, 1, k).expand(c, 1, 1, k).to(x.dtype)
    x = F.conv2d(x, kern_h, groups=c)
    x = F.conv2d(x, kern_w, groups=c)
    return x


def _ssim_cs(x: torch.Tensor, y: torch.Tensor, win: torch.Tensor,
             data_range: float, k1: float = 0.01, k2: float = 0.03
             ) -> Tuple[torch.Tensor, torch.Tensor]:
    """Per-channel (ssim, cs) means, each of shape (B, C). NCHW inputs."""
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu_x = _gaussian_filter(x, win)
    mu_y = _gaussian_filter(y, win)
    mu_xx, mu_yy, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sigma_xx = _gaussian_filter(x * x, win) - mu_xx
    sigma_yy = _gaussian_filter(y * y, win) - mu_yy
    sigma_xy = _gaussian_filter(x * y, win) - mu_xy
    cs_map = (2.0 * sigma_xy + c2) / (sigma_xx + sigma_yy + c2)
    ssim_map = ((2.0 * mu_xy + c1) / (mu_xx + mu_yy + c1)) * cs_map
    return ssim_map.flatten(2).mean(-1), cs_map.flatten(2).mean(-1)


def ms_ssim_torch(x: torch.Tensor, y: torch.Tensor, data_range: float = 1.0,
                  win_size: int = 7, win_sigma: float = 1.5,
                  weights: Sequence[float] = MS_WEIGHTS) -> float:
    """Multi-scale SSIM with pytorch_msssim's conventions. NCHW float in."""
    levels = len(weights)
    assert (min(x.shape[2], x.shape[3]) >> (levels - 1)) > win_size, (
        "image too small for the scale pyramid at this win_size")
    win = _gaussian_1d(win_size, win_sigma)
    x = x.float()
    y = y.float()
    mcs = []
    ssim_pc = None
    for i in range(levels):
        ssim_pc, cs = _ssim_cs(x, y, win, data_range)
        if i < levels - 1:
            mcs.append(torch.relu(cs))
            pad = [x.shape[2] % 2, x.shape[3] % 2]
            x = F.avg_pool2d(x, kernel_size=2, padding=pad)
            y = F.avg_pool2d(y, kernel_size=2, padding=pad)
    stack = torch.stack(mcs + [torch.relu(ssim_pc)], dim=0)  # (L, B, C)
    w = torch.tensor(list(weights), dtype=stack.dtype).view(-1, 1, 1)
    return float((stack ** w).prod(dim=0).mean())


def _minmax_per_channel(t: torch.Tensor) -> torch.Tensor:
    """The reference's normalization (losses.py:15-29): each channel
    scaled to [0, 1] by its min/max over the WHOLE batch — functional."""
    flat = t.transpose(0, 1).reshape(t.shape[1], -1)
    mins = flat.min(dim=1).values.view(1, -1, 1, 1)
    maxs = flat.max(dim=1).values.view(1, -1, 1, 1)
    return (t - mins) / (maxs - mins)


def reference_msssim_metric(hr_nhwc: np.ndarray, fake_nhwc: np.ndarray
                            ) -> float:
    """The full reference metric semantics on NHWC numpy fields:
    per-channel batch-global min-max normalize both inputs independently,
    then MS-SSIM(win_size=7, data_range=1) — losses.py:12-38."""
    hr = torch.from_numpy(np.ascontiguousarray(
        hr_nhwc.transpose(0, 3, 1, 2))).float()
    fake = torch.from_numpy(np.ascontiguousarray(
        fake_nhwc.transpose(0, 3, 1, 2))).float()
    return ms_ssim_torch(_minmax_per_channel(hr), _minmax_per_channel(fake),
                         data_range=1.0, win_size=7)
