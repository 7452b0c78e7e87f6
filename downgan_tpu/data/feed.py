"""Host -> device double-buffered batch feed.

SURVEY §7 data layer: the florida patch set fits HBM (device-resident
``DeviceDataset`` is the fast path, matching the reference's
whole-set-on-GPU residency), but bigger regions don't. This feed streams
batches from host memory with the next batch's transfer overlapped
against the current step's compute: JAX device transfers are async, so
enqueueing ``device_put`` for batch k+1 before consuming batch k gives a
two-deep pipeline without threads.

The reference has no equivalent (it asserts everything onto the GPU,
``DoWnGAN/GAN/stage.py:28-31``).
"""
from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional, Tuple

import jax
import numpy as np


class HostDataset:
    """Paired (coarse, fine) arrays resident in host RAM, NHWC."""

    def __init__(self, coarse: np.ndarray, fine: np.ndarray):
        assert coarse.shape[0] == fine.shape[0]
        self.coarse = np.ascontiguousarray(coarse, dtype=np.float32)
        self.fine = np.ascontiguousarray(fine, dtype=np.float32)

    def __len__(self) -> int:
        return int(self.coarse.shape[0])

    def epoch_perm(self, rng: np.random.Generator, batch_size: int,
                   shuffle: bool = True) -> np.ndarray:
        """Same drop-last permutation as DeviceDataset (one shared helper:
        residency tiers must draw bit-identical batch orders)."""
        from downgan_tpu.data.dataset import epoch_permutation

        return epoch_permutation(len(self), rng, batch_size, shuffle)


def prefetch_batches(
    dataset: HostDataset,
    perm: np.ndarray,
    sharding: Optional[jax.sharding.Sharding] = None,
    prefetch: int = 2,
    put_fn=None,
) -> Iterator[Tuple[jax.Array, jax.Array]]:
    """Yield device-resident (coarse, fine) batches for one epoch with
    ``prefetch`` batches in flight ahead of the consumer.

    The host side of ``put`` (batch assembly — a numpy fancy-index for
    :class:`HostDataset`, a disk read for
    :class:`~downgan_tpu.data.stream.StreamDataset`) runs on a single
    reader thread, so I/O overlaps the current step's compute as well as
    the (already-async) H2D transfer. One worker keeps batch order and
    read order deterministic.

    ``put_fn(coarse_rows, fine_rows)`` overrides the default
    ``device_put`` — the pod path passes
    :func:`~downgan_tpu.parallel.multihost.make_global_batch` here so
    each host's rows assemble into a globally-sharded batch inside the
    same pipeline (``jax.make_array_from_process_local_data`` is purely
    local: no cross-process ordering constraint from the reader thread).
    """

    def put(idx: np.ndarray) -> Tuple[jax.Array, jax.Array]:
        c = dataset.coarse[idx]
        f = dataset.fine[idx]
        if put_fn is not None:
            return put_fn(c, f)
        if sharding is not None:
            return jax.device_put(c, sharding), jax.device_put(f, sharding)
        return jax.device_put(c), jax.device_put(f)

    ex = ThreadPoolExecutor(max_workers=1)
    try:
        buf = []
        it = iter(perm)
        try:
            for _ in range(max(1, prefetch)):
                buf.append(ex.submit(put, next(it)))
        except StopIteration:
            pass
        for idx in it:
            out = buf.pop(0)
            buf.append(ex.submit(put, idx))
            yield out.result()
        while buf:
            yield buf.pop(0).result()
    finally:
        ex.shutdown(wait=True)
