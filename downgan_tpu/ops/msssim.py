"""SSIM / MS-SSIM in pure JAX (TPU-native).

The reference depends on ``pytorch_msssim.MS_SSIM(win_size=7, data_range=1,
channel=2)`` (``DoWnGAN/GAN/losses.py:12-38``). This module reimplements the
same algorithm from its published definition (Wang et al., "Multi-scale
structural similarity for image quality assessment") with the
pytorch_msssim conventions: separable gaussian window (sigma=1.5), VALID
convolution, K=(0.01, 0.03), 5 scales with weights
(0.0448, 0.2856, 0.3001, 0.2363, 0.1333), relu-clamped contrast terms, and
odd-size avg-pool padding between scales.

NHWC layout. The depthwise gaussian filtering is expressed as two 1-D
``lax.reduce_window``-style convolutions via ``lax.conv_general_dilated``
with feature_group_count=C so XLA maps it onto the VPU/MXU efficiently.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

MS_SSIM_WEIGHTS: Tuple[float, ...] = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _gaussian_kernel(win_size: int, sigma: float) -> jax.Array:
    coords = jnp.arange(win_size, dtype=jnp.float32) - win_size // 2
    g = jnp.exp(-(coords**2) / (2.0 * sigma**2))
    return g / jnp.sum(g)


def _blur(x: jax.Array, win: jax.Array) -> jax.Array:
    """Separable depthwise gaussian blur, VALID padding, NHWC."""
    c = x.shape[-1]
    k = win.shape[0]
    # Height pass: kernel (k,1,1,1) grouped over channels.
    kern_h = jnp.tile(win.reshape(k, 1, 1, 1), (1, 1, 1, c))
    kern_w = jnp.tile(win.reshape(1, k, 1, 1), (1, 1, 1, c))
    dn = lax.conv_dimension_numbers(x.shape, kern_h.shape, ("NHWC", "HWIO", "NHWC"))
    x = lax.conv_general_dilated(
        x, kern_h, window_strides=(1, 1), padding="VALID",
        dimension_numbers=dn, feature_group_count=c,
    )
    dn = lax.conv_dimension_numbers(x.shape, kern_w.shape, ("NHWC", "HWIO", "NHWC"))
    x = lax.conv_general_dilated(
        x, kern_w, window_strides=(1, 1), padding="VALID",
        dimension_numbers=dn, feature_group_count=c,
    )
    return x


def _ssim_per_channel(
    x: jax.Array, y: jax.Array, win: jax.Array, data_range: float,
    k1: float = 0.01, k2: float = 0.03,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (ssim, cs) of shape (B, C)."""
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu_x = _blur(x, win)
    mu_y = _blur(y, win)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sigma_xx = _blur(x * x, win) - mu_xx
    sigma_yy = _blur(y * y, win) - mu_yy
    sigma_xy = _blur(x * y, win) - mu_xy

    cs_map = (2.0 * sigma_xy + c2) / (sigma_xx + sigma_yy + c2)
    ssim_map = ((2.0 * mu_xy + c1) / (mu_xx + mu_yy + c1)) * cs_map

    ssim_val = jnp.mean(ssim_map, axis=(1, 2))
    cs_val = jnp.mean(cs_map, axis=(1, 2))
    return ssim_val, cs_val


def _downsample(x: jax.Array) -> jax.Array:
    """2x average pool with odd-size padding (pytorch_msssim convention).

    The reference calls ``F.avg_pool2d(kernel_size=2, padding=[H%2, W%2])``;
    torch's implicit pooling pad is symmetric, and with kernel 2 / stride 2
    the bottom/right pad element never enters a window — so the equivalent
    explicit form is a single zero at the TOP/LEFT of each odd axis, with
    the pad counted in the divisor (count_include_pad=True -> always /4).
    Verified against torch.nn.functional.avg_pool2d (tests/test_msssim.py).
    """
    pad_h = x.shape[1] % 2
    pad_w = x.shape[2] % 2
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (pad_h, 0), (pad_w, 0), (0, 0)))
    summed = lax.reduce_window(
        x, 0.0, lax.add, window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1), padding="VALID",
    )
    return summed * 0.25


@functools.partial(jax.jit, static_argnames=("data_range", "win_size", "win_sigma"))
def ssim(
    x: jax.Array, y: jax.Array, data_range: float = 1.0,
    win_size: int = 11, win_sigma: float = 1.5,
) -> jax.Array:
    """Mean single-scale SSIM over batch and channels, NHWC in [same shape]."""
    win = _gaussian_kernel(win_size, win_sigma)
    s, _ = _ssim_per_channel(x.astype(jnp.float32), y.astype(jnp.float32), win, data_range)
    return jnp.mean(s)


@functools.partial(
    jax.jit, static_argnames=("data_range", "win_size", "win_sigma", "weights")
)
def ms_ssim(
    x: jax.Array, y: jax.Array, data_range: float = 1.0,
    win_size: int = 7, win_sigma: float = 1.5,
    weights: Tuple[float, ...] = MS_SSIM_WEIGHTS,
) -> jax.Array:
    """Multi-scale SSIM, NHWC, matching pytorch_msssim semantics.

    The smallest scale must still fit the window:
    (min(H, W) >> (levels-1)) > win_size is required, as in pytorch_msssim.
    """
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    levels = len(weights)
    assert (min(x.shape[1], x.shape[2]) >> (levels - 1)) > win_size, (
        "image too small for MS-SSIM levels; reduce win_size or levels"
    )
    win = _gaussian_kernel(win_size, win_sigma)
    w = jnp.asarray(weights, dtype=jnp.float32)

    mcs = []
    ssim_val = None
    for i in range(levels):
        ssim_val, cs = _ssim_per_channel(x, y, win, data_range)
        if i < levels - 1:
            mcs.append(jax.nn.relu(cs))
            x = _downsample(x)
            y = _downsample(y)
    ssim_val = jax.nn.relu(ssim_val)  # (B, C)

    mcs_stack = jnp.stack(mcs + [ssim_val], axis=0)  # (levels, B, C)
    msssim_per_channel = jnp.prod(mcs_stack ** w[:, None, None], axis=0)
    return jnp.mean(msssim_per_channel)


def minmax_normalize_per_channel(x: jax.Array) -> jax.Array:
    """Batch-global per-channel min-max normalization to [0, 1].

    Functional version of the in-place normalization the reference's
    ``SSIM_Loss`` performs on its inputs (``losses.py:15-29``): min/max are
    taken over the whole batch per channel.

    Degenerate-input guard (the reference divides by zero here,
    ``losses.py:20-29``, NaN-poisoning the metric): a constant channel has
    span 0 and normalizes to the constant 0 field instead of NaN, so two
    identical constant channels score MS-SSIM similarity 1. Non-degenerate
    channels are bit-identical to the unguarded formula.
    """
    mins = jnp.min(x, axis=(0, 1, 2), keepdims=True)
    maxs = jnp.max(x, axis=(0, 1, 2), keepdims=True)
    span = maxs - mins
    return (x - mins) / jnp.where(span > 0, span, 1.0)


def msssim_metric(hr: jax.Array, fake: jax.Array) -> jax.Array:
    """The reference's MSSSIM metric: min-max normalize both fields, then
    MS-SSIM with win_size=7, data_range=1 (``losses.py:12-38``). NHWC."""
    return ms_ssim(
        minmax_normalize_per_channel(hr),
        minmax_normalize_per_channel(fake),
        data_range=1.0,
        win_size=7,
    )
