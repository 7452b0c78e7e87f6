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


def _randomized_svd(x: np.ndarray, k: int, oversample: int = 10,
                    iters: int = 2, seed: int = 0):
    """Leading-k (singular values, right singular vectors) via randomized
    subspace iteration (Halko et al. 2011) — what sklearn's
    ``svd_solver="auto"`` picks at the reference's real-data scale
    (``PCA(ncomp).fit`` on ~15k x 16k matrices, ``prep_gan.py:226-255``):
    O(n·p·k) instead of a full LAPACK SVD's O(n·p·min(n,p)). Deterministic
    (fixed seed); two power iterations make the leading subspace accurate
    far beyond the eof_loss tolerance."""
    rng = np.random.default_rng(seed)
    m = min(k + oversample, min(x.shape))
    q, _ = np.linalg.qr(x @ rng.standard_normal((x.shape[1], m)))
    for _ in range(iters):
        z, _ = np.linalg.qr(x.T @ q)
        q, _ = np.linalg.qr(x @ z)
    _, s, vt = np.linalg.svd(q.T @ x, full_matrices=False)
    return s[:k], vt[:k]


def fit_eofs(data: np.ndarray, n_components: int) -> EOFBasis:
    """PCA via SVD with sklearn conventions (mean-centered, components =
    leading right singular vectors). ``data``: (samples, pixels) — callers
    flatten (time, lat, lon) fields over space, matching the reference's
    per-channel EOF prep (``prep_gan.py:226-239``). Small inputs use the
    exact economy SVD; past the size where a full LAPACK SVD would take
    hours/GBs on a training host, the randomized solver takes over (the
    same auto-selection sklearn's PCA applies upstream)."""
    data = np.asarray(data, dtype=np.float64)
    mean = data.mean(axis=0)
    centered = data - mean
    n = min(n_components, min(centered.shape))
    if min(centered.shape) > 2048:
        s, vt = _randomized_svd(centered, n)
    else:
        # Economy SVD: components are Vt rows; variance from singular values.
        _, s, vt = np.linalg.svd(centered, full_matrices=False)
        s, vt = s[:n], vt[:n]
    explained = (s ** 2) / max(data.shape[0] - 1, 1)
    return EOFBasis(
        components=vt.astype(np.float32),
        mean=mean.astype(np.float32),
        explained_variance=explained.astype(np.float32),
    )


def project(basis: EOFBasis, fields: np.ndarray) -> np.ndarray:
    """(samples, pixels) -> (samples, n_comp) EOF projections (centered)."""
    return (np.asarray(fields) - basis.mean) @ basis.components.T


def reconstruct(basis: EOFBasis, projections: np.ndarray) -> np.ndarray:
    """(samples, n_comp) -> (samples, pixels) low-rank reconstruction."""
    return projections @ basis.components + basis.mean


def fit_eofs_per_channel(
    fields: np.ndarray, n_components: int, return_means: bool = False
):
    """Per-channel EOFs of an NHWC field set -> (n_comp, C, H*W) stack,
    the layout :func:`downgan_tpu.ops.losses.eof_loss` consumes.
    ``return_means=True`` additionally returns the per-channel PCA means
    as a (C, H*W) array — needed to reproduce the reference's centered
    projection semantics in :func:`low_pass_eof_batch`."""
    n, h, w, c = fields.shape
    comps = []
    means = []
    for ch in range(c):
        basis = fit_eofs(fields[..., ch].reshape(n, h * w), n_components)
        comps.append(basis.components)
        means.append(basis.mean)
    stacked = np.stack(comps, axis=1)  # (n_comp, C, H*W)
    if return_means:
        return stacked, np.stack(means, axis=0)  # (C, H*W)
    return stacked


def low_pass_eof_batch(
    batch: jax.Array,
    components: jax.Array,
    mean: Optional[jax.Array] = None,
    add_mean_back: bool = True,
) -> jax.Array:
    """Project an NHWC batch onto leading EOFs and reconstruct — a spatial
    low-pass in EOF space. Pure JAX, jittable: two matmuls on the MXU.

    ``components``: (n_comp, C, H*W) from :func:`fit_eofs_per_channel`
    (or (n_comp, H*W) shared across channels); ``mean``: the matching PCA
    mean(s), (C, H*W) / (H*W,).

    The reference's torch version (``losses.py:196-228`` — dead code
    upstream: nothing calls it) projects via sklearn's ``transform``,
    which SUBTRACTS the PCA mean, and reconstructs ``components.T @ Z``
    WITHOUT adding it back; reproduce that exactly with
    ``mean=<pca means>, add_mean_back=False``. The default
    (``add_mean_back=True``) is the textbook low-pass reconstruction.
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
    if mean is not None and add_mean_back:
        rec = rec + mean
    return rec.reshape(b, c, h, w).transpose(0, 2, 3, 1)
