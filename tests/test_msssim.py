"""MS-SSIM tests: identity, sensitivity, cross-check of the single-scale
SSIM core against an independent NumPy/scipy implementation, and the
reference metric's min-max normalization semantics (losses.py:12-38).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from downgan_tpu.ops.msssim import (
    minmax_normalize_per_channel,
    ms_ssim,
    msssim_metric,
    ssim,
)


def _numpy_ssim(x, y, win_size=7, sigma=1.5, data_range=1.0):
    """Independent single-channel SSIM with a separable gaussian window and
    VALID padding (Wang et al. 2003 definition)."""
    from scipy.signal import convolve2d

    coords = np.arange(win_size) - win_size // 2
    g = np.exp(-(coords**2) / (2 * sigma**2))
    g /= g.sum()
    win = np.outer(g, g)

    def blur(a):
        return convolve2d(a, win, mode="valid")

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu_x, mu_y = blur(x), blur(y)
    sxx = blur(x * x) - mu_x**2
    syy = blur(y * y) - mu_y**2
    sxy = blur(x * y) - mu_x * mu_y
    cs = (2 * sxy + c2) / (sxx + syy + c2)
    s = ((2 * mu_x * mu_y + c1) / (mu_x**2 + mu_y**2 + c1)) * cs
    return s.mean()


def test_ssim_identity():
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 2))
    assert float(ssim(x, x, win_size=7)) == pytest.approx(1.0, abs=1e-6)


def test_ms_ssim_identity():
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 128, 128, 2))
    assert float(ms_ssim(x, x, win_size=7)) == pytest.approx(1.0, abs=1e-5)


def test_ssim_matches_independent_numpy():
    rng = np.random.RandomState(0)
    x = rng.rand(1, 40, 40, 1).astype(np.float32)
    y = np.clip(x + 0.1 * rng.randn(1, 40, 40, 1).astype(np.float32), 0, 1)
    ours = float(ssim(jnp.asarray(x), jnp.asarray(y), win_size=7))
    theirs = _numpy_ssim(x[0, :, :, 0], y[0, :, :, 0], win_size=7)
    assert ours == pytest.approx(theirs, abs=2e-4)


def test_ms_ssim_decreases_with_noise():
    key = jax.random.PRNGKey(1)
    x = jax.random.uniform(key, (2, 128, 128, 2))
    vals = []
    for scale in (0.01, 0.1, 0.5):
        noise = scale * jax.random.normal(jax.random.PRNGKey(2), x.shape)
        vals.append(float(ms_ssim(x, jnp.clip(x + noise, 0, 1))))
    assert vals[0] > vals[1] > vals[2]
    assert all(0.0 <= v <= 1.0 for v in vals)


def test_minmax_normalize_bounds():
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 16, 16, 2)) * 10 + 3
    n = minmax_normalize_per_channel(x)
    assert float(jnp.max(n)) == pytest.approx(1.0, abs=1e-6)
    assert float(jnp.min(n)) == pytest.approx(0.0, abs=1e-6)
    # Per-channel: each channel attains both bounds over the whole batch
    # (the reference normalizes u and v separately, losses.py:15-29).
    for c in range(2):
        assert float(jnp.max(n[..., c])) == pytest.approx(1.0, abs=1e-6)
        assert float(jnp.min(n[..., c])) == pytest.approx(0.0, abs=1e-6)


def test_msssim_metric_no_mutation():
    """Unlike the reference SSIM_Loss (in-place input mutation,
    losses.py:20-29), our metric must leave inputs untouched."""
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 128, 128, 2)) * 4
    y = x + 0.1
    x_before = np.asarray(x).copy()
    val = float(msssim_metric(x, y))
    np.testing.assert_array_equal(np.asarray(x), x_before)
    assert 0.0 <= val <= 1.0
