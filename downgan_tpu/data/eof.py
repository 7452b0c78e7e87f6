"""EOF (PCA) analysis of climate fields — numpy SVD, no sklearn.

Capability parity with the reference's EOF machinery: the sklearn-PCA
computation in ``DoWnGAN/helpers/prep_gan.py:226-255``
(``get_eofs_and_project``) and the EOF-space losses it feeds
(``DoWnGAN/GAN/losses.py:72-116`` ``eof_loss``, ``:196-228``
``low_pass_eof_batch``). sklearn is not in this environment; PCA here is
a thin SVD with the same conventions (mean-centering over samples,
components = right singular vectors).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class EOFBasis:
    """Leading EOFs of a (samples, pixels) field collection.

    ``components``: (n_comp, n_pixels); ``mean``: (n_pixels,);
    ``explained_variance``: (n_comp,).
    """

    components: np.ndarray
    mean: np.ndarray
    explained_variance: np.ndarray

    @property
    def n_components(self) -> int:
        return self.components.shape[0]


def fit_eofs(data: np.ndarray, n_components: int) -> EOFBasis:
    """PCA via SVD with sklearn conventions (mean-centered, components =
    leading right singular vectors). ``data``: (samples, pixels) — callers
    flatten (time, lat, lon) fields over space, matching the reference's
    per-channel EOF prep (``prep_gan.py:226-239``)."""
    data = np.asarray(data, dtype=np.float64)
    mean = data.mean(axis=0)
    centered = data - mean
    # Economy SVD: components are Vt rows; variance from singular values.
    _, s, vt = np.linalg.svd(centered, full_matrices=False)
    n = min(n_components, vt.shape[0])
    explained = (s[:n] ** 2) / max(data.shape[0] - 1, 1)
    return EOFBasis(
        components=vt[:n].astype(np.float32),
        mean=mean.astype(np.float32),
        explained_variance=explained.astype(np.float32),
    )


def project(basis: EOFBasis, fields: np.ndarray) -> np.ndarray:
    """(samples, pixels) -> (samples, n_comp) EOF projections (centered)."""
    return (np.asarray(fields) - basis.mean) @ basis.components.T


def reconstruct(basis: EOFBasis, projections: np.ndarray) -> np.ndarray:
    """(samples, n_comp) -> (samples, pixels) low-rank reconstruction."""
    return projections @ basis.components + basis.mean


def fit_eofs_per_channel(fields: np.ndarray, n_components: int) -> np.ndarray:
    """Per-channel EOFs of an NHWC field set -> (n_comp, C, H*W) stack,
    the layout :func:`downgan_tpu.ops.losses.eof_loss` consumes."""
    n, h, w, c = fields.shape
    comps = []
    for ch in range(c):
        basis = fit_eofs(fields[..., ch].reshape(n, h * w), n_components)
        comps.append(basis.components)
    return np.stack(comps, axis=1)  # (n_comp, C, H*W)


def low_pass_eof_batch(
    batch: jax.Array, components: jax.Array, mean: Optional[jax.Array] = None
) -> jax.Array:
    """Project an NHWC batch onto leading EOFs and reconstruct — a spatial
    low-pass in EOF space (parity with ``losses.py:196-228``). Pure JAX,
    jittable: two matmuls on the MXU.

    ``components``: (n_comp, C, H*W) from :func:`fit_eofs_per_channel`
    (or (n_comp, H*W) shared across channels).
    """
    b, h, w, c = batch.shape
    flat = batch.transpose(0, 3, 1, 2).reshape(b, c, h * w)
    if mean is not None:
        flat = flat - mean
    if components.ndim == 2:
        proj = jnp.einsum("bcp,kp->bck", flat, components)
        rec = jnp.einsum("bck,kp->bcp", proj, components)
    else:
        proj = jnp.einsum("bcp,kcp->bck", flat, components)
        rec = jnp.einsum("bck,kcp->bcp", proj, components)
    if mean is not None:
        rec = rec + mean
    return rec.reshape(b, c, h, w).transpose(0, 2, 3, 1)
