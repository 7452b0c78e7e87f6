"""Multi-host (pod / multi-slice) training support.

One v5e host sees only its local chips; a pod run is one JAX program per
host coordinated through ``jax.distributed``. These helpers implement the
standard recipe, and the Trainer/CLI consume them directly
(``Trainer(multihost=...)`` / ``train --multihost``):

  * :func:`initialize` — `jax.distributed.initialize` from env or args
    (no-op on single-host, so the same entry point runs everywhere);
  * :func:`global_mesh` — mesh over ALL devices in the job (ICI within a
    slice, DCN across slices if present);
  * :func:`process_batch_slice` — which rows of a global batch this host
    must feed (per-host data loading: every host materializes only its
    shard, then `jax.make_array_from_process_local_data` assembles the
    global array). The Trainer's multihost HostDataset path feeds exactly
    this way; its DeviceDataset path replicates the set globally
    (``DeviceDataset.from_numpy_global``) and runs the compiled DP epoch
    scan.

Hardware with >1 host is not reachable in this environment; the FULL
Trainer loop (epochs + checkpoints + tracker metrics) is integration-
tested across 2 real processes on a CPU mesh
(``tests/test_parallel.py::test_two_process_full_trainer``) against the
single-process trajectory.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np

from downgan_tpu.parallel.mesh import DATA_AXIS, batch_sharding, make_mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed for a multi-host job; no-op single-host.

    With no arguments, relies on the TPU environment's auto-detection
    (the standard path on Cloud TPU pods). Safe to call unconditionally.
    """
    if num_processes is not None and num_processes <= 1:
        return
    explicit = coordinator_address is not None or process_id is not None or (
        num_processes is not None)
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as exc:
        # Tolerate only the already-initialized case. Everything else —
        # including the late-call error ("...must be called before any JAX
        # calls") on the AUTO-DETECT path — must fail loudly: swallowing it
        # would silently degrade a pod job to N independent single-host
        # runs (process_count()==1, every host feeding the full batch).
        # jax 0.9 phrases the repeat-call error "distributed.initialize
        # should only be called once.".
        msg = str(exc).lower()
        if ("should only be called once" in msg
                or "already initialized" in msg):
            return
        raise
    except ValueError:
        if explicit:
            raise
        # No explicit args: auto-detection unavailable (single-host) — fine.


def global_mesh(axes: Sequence[str] = (DATA_AXIS,)):
    """Mesh over every device in the job (all hosts)."""
    return make_mesh(axes=axes, devices=jax.devices())


def process_batch_slice(global_batch: int, process_index: Optional[int] = None,
                        process_count: Optional[int] = None) -> Tuple[int, int]:
    """[start, stop) rows of the global batch this host feeds.

    Requires the global batch to divide evenly over hosts (static shapes).
    """
    pc = jax.process_count() if process_count is None else process_count
    pi = jax.process_index() if process_index is None else process_index
    if global_batch % pc:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{pc} processes")
    per = global_batch // pc
    return pi * per, (pi + 1) * per


def make_global_batch(mesh, local_rows: np.ndarray,
                      batch_axis: int = 0) -> jax.Array:
    """Assemble a globally-sharded batch from this host's rows.

    ``local_rows``: the rows from :func:`process_batch_slice`, taken along
    ``batch_axis`` (0 for (B, ...) batches; 1 for the fused schedule's
    (n_critic, B, ...) stacks). Returns a global jax.Array sharded over
    the mesh's data axis at that position.
    """
    sharding = batch_sharding(mesh, ndim=local_rows.ndim,
                              batch_axis=batch_axis)
    return jax.make_array_from_process_local_data(sharding, local_rows)
