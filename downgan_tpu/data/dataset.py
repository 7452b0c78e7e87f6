"""Device-resident dataset + synthetic data generation.

The reference keeps the entire train and test sets resident on the GPU
(``DoWnGAN/GAN/stage.py:28-31``) and draws shuffled batches with a torch
DataLoader (``stage.py:73-81``). TPU-native equivalent: arrays live in HBM
(optionally sharded over the mesh's data axis); each epoch the host draws a
permutation matrix of indices and the jitted epoch program gathers batches
on device — zero host<->device traffic inside the epoch.

Also provides the synthetic-dataset generator the test/benchmark harness
uses in place of the reference's 2.9 MB ERA NetCDF fixture: spatially
correlated gaussian random fields built by FFT-filtering white noise with a
power-law spectrum, so spectral metrics (RALSD) see realistic decay, plus
a coarse field derived by block-averaging the fine field (consistent
8x coarse/fine pairing, unlike independent noise).
"""
from __future__ import annotations

import dataclasses
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def epoch_permutation(n: int, rng: np.random.Generator, batch_size: int,
                      shuffle: bool = True) -> np.ndarray:
    """(n_steps, batch_size) drop-last permutation index matrix — the ONE
    batch-order rule every residency tier shares, so device-resident,
    host-fed, and disk-streamed training draw bit-identical trajectories.
    int32: it feeds device gathers."""
    idx = rng.permutation(n) if shuffle else np.arange(n)
    n_steps = n // batch_size
    return idx[: n_steps * batch_size].reshape(n_steps, batch_size).astype(np.int32)


@dataclasses.dataclass
class DeviceDataset:
    """Paired (coarse, fine) arrays resident on device, NHWC.

    Parity with ``NetCDFSR`` (``GAN/dataloader.py:6-33``) + DataLoader
    shuffle semantics, with drop-last for static shapes under jit.
    """

    coarse: jax.Array  # (N, h, w, n_covariates)
    fine: jax.Array  # (N, H, W, n_predictands)
    # Host-side copies, kept when the set was staged FROM numpy (always
    # the case for multihost global arrays). Eval-tail/plot gathers on a
    # replicated global array must index on host — without these they
    # would re-fetch the whole set device-to-host every time.
    host_coarse: Optional[np.ndarray] = None
    host_fine: Optional[np.ndarray] = None

    def __post_init__(self) -> None:
        assert self.coarse.shape[0] == self.fine.shape[0]

    def __len__(self) -> int:
        return int(self.coarse.shape[0])

    def epoch_perm(self, rng: np.random.Generator, batch_size: int, shuffle: bool = True) -> np.ndarray:
        """(n_steps, batch_size) permutation index matrix, drop-last."""
        return epoch_permutation(len(self), rng, batch_size, shuffle)

    def batches(
        self, rng: np.random.Generator, batch_size: int, shuffle: bool = True
    ) -> Iterator[Tuple[jax.Array, jax.Array]]:
        """Python-loop batch iterator (the non-scan path)."""
        for idx in self.epoch_perm(rng, batch_size, shuffle):
            yield jnp.take(self.coarse, idx, axis=0), jnp.take(self.fine, idx, axis=0)

    @staticmethod
    def from_numpy(
        coarse: np.ndarray,
        fine: np.ndarray,
        sharding: Optional[jax.sharding.Sharding] = None,
        dtype: np.dtype = np.float32,
    ) -> "DeviceDataset":
        coarse = np.asarray(coarse, dtype=dtype)
        fine = np.asarray(fine, dtype=dtype)
        if sharding is not None:
            return DeviceDataset(
                jax.device_put(coarse, sharding), jax.device_put(fine, sharding)
            )
        return DeviceDataset(jnp.asarray(coarse), jnp.asarray(fine))

    @staticmethod
    def from_numpy_global(
        mesh: jax.sharding.Mesh,
        coarse: np.ndarray,
        fine: np.ndarray,
        dtype: np.dtype = np.float32,
    ) -> "DeviceDataset":
        """Multihost staging: replicated GLOBAL arrays over a mesh that may
        span processes. Each process supplies the full array for its
        addressable shards (``jax.make_array_from_callback``; a plain
        ``device_put`` cannot target another host's devices) — the analogue
        of the reference's whole-set-on-GPU residency for a pod, feeding
        the compiled DP epoch scan unchanged."""
        from jax.sharding import NamedSharding, PartitionSpec

        sharding = NamedSharding(mesh, PartitionSpec())

        coarse = np.asarray(coarse, dtype=dtype)
        fine = np.asarray(fine, dtype=dtype)

        def put(a: np.ndarray) -> jax.Array:
            return jax.make_array_from_callback(a.shape, sharding, lambda idx: a[idx])

        return DeviceDataset(put(coarse), put(fine),
                             host_coarse=coarse, host_fine=fine)


def _correlated_field(
    rng: np.random.Generator, shape: Tuple[int, int, int], slope: float = -1.5
) -> np.ndarray:
    """(T, H, W) gaussian random fields with a power-law radial spectrum."""
    t, h, w = shape
    noise = rng.standard_normal(shape).astype(np.float32)
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.fftfreq(w)[None, :]
    r = np.sqrt(fy**2 + fx**2)
    r[0, 0] = 1.0
    amp = r ** (slope / 2.0)
    amp[0, 0] = 0.0
    f = np.fft.fft2(noise, axes=(-2, -1)) * amp[None]
    field = np.real(np.fft.ifft2(f, axes=(-2, -1)))
    field = field / field.std()
    return field.astype(np.float32)


def synthetic_dataset(
    n_samples: int = 256,
    coarse_size: int = 16,
    fine_size: int = 128,
    n_covariates: int = 7,
    n_predictands: int = 2,
    seed: int = 0,
    covariate_noise: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Synthetic paired (coarse, fine) set, NHWC, standardized.

    Fine predictands are correlated random wind-like fields; the first
    ``n_predictands`` coarse covariates are their block-averaged versions
    (the physically consistent analogue of regridded u10/v10); remaining
    covariates are independent correlated fields (stand-ins for lsm, sp,
    sr, z, cape). Serves the role of the reference's ``coarse_test.nc``
    fixture + ``gen_fake_ds`` synthetic path for tests and benchmarks.

    ``covariate_noise`` > 0 adds white noise of that std to the block-
    averaged covariates (the fields are ~unit variance), degrading the
    predictors to a realistic SNR — regridded reanalysis covariates are
    not a deterministic function of the target the way a pure block
    average is. Used by the fixed-budget quality gate
    (``benchmarks/quality_gate.py``); the default 0 keeps every existing
    fixture bit-identical.
    """
    rng = np.random.default_rng(seed)
    factor = fine_size // coarse_size

    fine = np.stack(
        [_correlated_field(rng, (n_samples, fine_size, fine_size)) for _ in range(n_predictands)],
        axis=-1,
    )
    coarse_from_fine = fine.reshape(
        n_samples, coarse_size, factor, coarse_size, factor, n_predictands
    ).mean(axis=(2, 4))
    if covariate_noise > 0.0:
        coarse_from_fine = coarse_from_fine + covariate_noise * rng.standard_normal(
            coarse_from_fine.shape
        ).astype(np.float32)
    extra = np.stack(
        [
            _correlated_field(rng, (n_samples, coarse_size, coarse_size))
            for _ in range(n_covariates - n_predictands)
        ],
        axis=-1,
    ) if n_covariates > n_predictands else np.zeros((n_samples, coarse_size, coarse_size, 0), np.float32)
    coarse = np.concatenate([coarse_from_fine, extra], axis=-1)

    coarse = (coarse - coarse.mean()) / coarse.std()
    fine = (fine - fine.mean()) / fine.std()
    return coarse.astype(np.float32), fine.astype(np.float32)
