"""Loss and physics-metric library (TPU-native, pure functions).

Capability parity with the reference loss library
(``DoWnGAN/GAN/losses.py:8-228``), re-designed as pure jittable functions
over NHWC arrays. Differences from the reference, by design:

  * No in-place input mutation (the reference's ``SSIM_Loss`` normalizes
    its inputs destructively, ``losses.py:20-29``; our MS-SSIM metric does
    the same min-max normalization functionally — see
    :func:`downgan_tpu.ops.msssim.msssim_metric`).
  * No ``.item()`` host syncs — everything returns device scalars that the
    trainer accumulates on device.
  * Channel axis is the last axis (NHWC): channel 0 = u10, channel 1 = v10.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def wass_loss(c_real_mean: jax.Array, c_fake_mean: jax.Array) -> jax.Array:
    """Wasserstein distance estimate: E[C(real)] - E[C(fake)].

    (Reference ``losses.py:8-9`` applied to critic means.)
    """
    return c_real_mean - c_fake_mean


def content_loss(hr: jax.Array, fake: jax.Array) -> jax.Array:
    """Pixel-wise L1 (reference ``losses.py:40-55``)."""
    return jnp.mean(jnp.abs(hr - fake))


def content_mse_loss(hr: jax.Array, fake: jax.Array) -> jax.Array:
    """Pixel-wise MSE (reference ``losses.py:58-70``)."""
    return jnp.mean(jnp.square(hr - fake))


def _finite_differences(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """du/dy and dv/dx forward differences on the interior grid.

    NHWC: axis 1 = lat (y), axis 2 = lon (x); channel 0 = u, channel 1 = v.
    Matches the index arithmetic of reference ``losses.py:137-145`` (regular
    grid, no spacing division).
    """
    dudy = x[:, 1:, 1:, 0] - x[:, :-1, 1:, 0]
    dvdx = x[:, 1:, 1:, 1] - x[:, 1:, :-1, 1]
    return dudy, dvdx


def divergence_loss(hr: jax.Array, fake: jax.Array) -> jax.Array:
    """MSE between std-normalized divergence fields.

    (Reference ``losses.py:119-155``; golden value 0.0018 on the analytic
    Gaussian fixture, ``GAN/tests/test_losses.py:90-94``.)
    """
    dudy_r, dvdx_r = _finite_differences(hr)
    dudy_f, dvdx_f = _finite_differences(fake)
    div_r = dudy_r + dvdx_r
    div_f = dudy_f + dvdx_f
    div_r = div_r / jnp.std(div_r)
    div_f = div_f / jnp.std(div_f)
    return jnp.mean(jnp.square(div_r - div_f))


def vorticity_loss(hr: jax.Array, fake: jax.Array) -> jax.Array:
    """MSE between std-normalized vorticity fields.

    (Reference ``losses.py:158-193``; golden value 0.00144,
    ``GAN/tests/test_losses.py:112-116``.)
    """
    dudy_r, dvdx_r = _finite_differences(hr)
    dudy_f, dvdx_f = _finite_differences(fake)
    vort_r = dvdx_r - dudy_r
    vort_f = dvdx_f - dudy_f
    vort_r = vort_r / jnp.std(vort_r)
    vort_f = vort_f / jnp.std(vort_f)
    return jnp.mean(jnp.square(vort_r - vort_f))


def eof_loss(components: jax.Array, hr: jax.Array, fake: jax.Array) -> jax.Array:
    """MSE between std-normalized EOF (PCA) projections of real and fake.

    ``components``: (n_comp, n_pixels) leading EOFs per channel, or
    (n_comp, channels, n_pixels). Fields are flattened over space and
    projected; projections are normalized by their own std before the MSE —
    matching reference ``losses.py:72-116``.
    """
    b = hr.shape[0]
    c = hr.shape[-1]
    hr_flat = hr.transpose(0, 3, 1, 2).reshape(b, c, -1)
    fake_flat = fake.transpose(0, 3, 1, 2).reshape(b, c, -1)
    if components.ndim == 2:
        proj_r = jnp.einsum("bcp,kp->bck", hr_flat, components)
        proj_f = jnp.einsum("bcp,kp->bck", fake_flat, components)
    else:
        proj_r = jnp.einsum("bcp,kcp->bck", hr_flat, components)
        proj_f = jnp.einsum("bcp,kcp->bck", fake_flat, components)
    proj_r = proj_r / jnp.std(proj_r)
    proj_f = proj_f / jnp.std(proj_f)
    return jnp.mean(jnp.square(proj_f - proj_r))


def low_pass(x: jax.Array, filter_size: int = 5) -> jax.Array:
    """Replication-pad + average-pool low-pass filter (stride 1).

    The frequency-separation trainer's low-pass component: reference
    ``config/hyperparams.py:30-33`` (``AvgPool2d(5, stride=1)`` after
    ``ReplicationPad2d(2)``). NHWC, shape-preserving.
    """
    pad = filter_size // 2
    x_p = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
    window = (1, filter_size, filter_size, 1)
    summed = jax.lax.reduce_window(
        x_p, 0.0, jax.lax.add, window_dimensions=window, window_strides=(1, 1, 1, 1),
        padding="VALID",
    )
    return summed / float(filter_size * filter_size)


def high_pass(x: jax.Array, filter_size: int = 5) -> jax.Array:
    """High-frequency residual: x - low_pass(x) (reference wasserstein_fs.py:37-41)."""
    return x - low_pass(x, filter_size)
