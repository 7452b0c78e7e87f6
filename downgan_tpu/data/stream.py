"""Disk-streamed dataset: batches read lazily from preprocessed NetCDFs.

Third residency tier of the data layer, completing the scaling story:

  * :class:`~downgan_tpu.data.dataset.DeviceDataset` — whole set in HBM
    (the reference's whole-set-on-GPU residency, ``GAN/stage.py:28-31``);
  * :class:`~downgan_tpu.data.feed.HostDataset` — whole set in host RAM,
    batches double-buffered onto the device;
  * :class:`StreamDataset` (this module) — set stays ON DISK in the
    preprocessed NetCDFs (``staging.write_preprocessed`` layout); only the
    current batch is ever materialized, read through h5py with CF
    decoding. For regions/periods too large for host RAM (the reference
    cannot train these at all — it asserts the full tensors onto one GPU).

``StreamDataset`` duck-types :class:`HostDataset` (``.coarse[idx]``,
``.fine[idx]``, ``epoch_perm``, ``__len__``) so the Trainer's per-step
loop, the double-buffered feed, and the multihost per-host-rows path work
unchanged — in a pod each host reads only its own batch rows from disk.
Trajectories are bit-identical to device-resident training (tested).
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import h5py
import numpy as np

from downgan_tpu.data.feed import HostDataset
from downgan_tpu.data.netcdf import _decode_cf, _h5_attrs


class LazyField:
    """NHWC view of a preprocessed ``(time, var, lat, lon)`` NetCDF
    variable, read lazily by time index.

    ``field[idx]`` accepts an int or any integer index array — unsorted
    and with duplicates (h5py fancy indexing requires sorted unique
    indices; reads go through ``np.unique`` + inverse mapping). Returns
    float32 NHWC, CF-decoded (packed variables supported).
    """

    def __init__(self, path: str, var: str = "data"):
        self.path = path
        self._file = h5py.File(path, "r")
        self._ds = self._file[var]
        if self._ds.ndim != 4:
            raise ValueError(
                f"{path}:{var} has {self._ds.ndim} dims, expected 4 "
                "(time, var, lat, lon) — the write_preprocessed layout")
        self._attrs = _h5_attrs(self._ds)
        t, v, h, w = self._ds.shape
        self.shape: Tuple[int, int, int, int] = (t, h, w, v)

    def __len__(self) -> int:
        return int(self.shape[0])

    def __getitem__(self, idx) -> np.ndarray:
        scalar = np.isscalar(idx) or (isinstance(idx, np.ndarray) and idx.ndim == 0)
        sel = np.atleast_1d(np.asarray(idx))
        if sel.dtype.kind not in "iu":
            raise TypeError(f"LazyField indices must be integers, got {sel.dtype}")
        uniq, inv = np.unique(sel, return_inverse=True)
        raw = self._ds[uniq] if uniq.size > 1 else self._ds[int(uniq[0])][None]
        data = _decode_cf(raw, self._attrs)
        out = np.ascontiguousarray(
            np.transpose(data[inv.reshape(sel.shape)], (0, 2, 3, 1)),
            dtype=np.float32)
        return out[0] if scalar else out

    def __array__(self, dtype=None) -> np.ndarray:
        """Full materialization (e.g. the Trainer's EOF-basis fit reads
        every training fine field once). Deliberate: one sequential pass,
        not the random-access path."""
        out = self[np.arange(len(self))]
        return out if dtype is None else out.astype(dtype, copy=False)

    def close(self) -> None:
        self._file.close()


class StreamDataset(HostDataset):
    """Paired (coarse, fine) :class:`LazyField` s over the preprocessed
    NetCDF pair. Same interface as :class:`HostDataset`; only batches are
    materialized."""

    def __init__(self, coarse_path: str, fine_path: str):
        self.coarse = LazyField(coarse_path)
        self.fine = LazyField(fine_path)
        if len(self.coarse) != len(self.fine):
            raise ValueError(
                f"coarse/fine sample counts differ: {len(self.coarse)} "
                f"({coarse_path}) vs {len(self.fine)} ({fine_path})")

    @classmethod
    def from_preprocessed(cls, config, split: str) -> "StreamDataset":
        """Open the ``<kind>_<split>_<region>.nc`` pair written by
        ``staging.write_preprocessed`` / the ``prepare-data`` CLI."""
        from downgan_tpu.data.staging import preprocessed_path

        coarse = preprocessed_path(config, "coarse", split)
        fine = preprocessed_path(config, "fine", split)
        for p in (coarse, fine):
            if not os.path.exists(p):
                raise FileNotFoundError(
                    f"preprocessed file not found: {p} — run "
                    "`downgan prepare-data` first (streaming reads the "
                    "preprocessed layout only)")
        return cls(coarse, fine)

    def close(self) -> None:
        self.coarse.close()
        self.fine.close()

    def __enter__(self) -> "StreamDataset":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
