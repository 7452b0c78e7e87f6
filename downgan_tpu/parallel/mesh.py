"""Device mesh and sharding helpers (TPU-native; no reference equivalent).

Follows the standard JAX SPMD recipe: build a ``jax.sharding.Mesh`` over
the slice, annotate the batch axis with a ``NamedSharding``, keep model
state replicated, and let GSPMD insert the gradient all-reduce over ICI.
The mesh admits a second ``spatial`` axis for halo-exchange spatial
parallelism on large fields (SURVEY §5 "long-context analogue").
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def make_mesh(
    shape: Sequence[int] = (-1,),
    axes: Sequence[str] = (DATA_AXIS,),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh over ``devices`` (default: all local devices).

    A single ``-1`` in ``shape`` absorbs the remaining device count, like a
    reshape wildcard. Mesh-major ordering follows ``jax.devices()``, which
    on TPU enumerates chips in ICI-neighbour order, so the data axis rides
    ICI links.
    """
    devices = list(devices if devices is not None else jax.devices())
    shape = list(shape)
    n = len(devices)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        if n % known:
            raise ValueError(f"{n} devices not divisible by mesh shape {shape}")
        shape[shape.index(-1)] = n // known
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axes))


def batch_sharding(
    mesh: Mesh, ndim: int = 4, axis: str = DATA_AXIS, batch_axis: int = 0
) -> NamedSharding:
    """Shard the batch axis (at position ``batch_axis``) over ``axis``."""
    spec = [None] * ndim
    spec[batch_axis] = axis
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays: jax.Array) -> Tuple[jax.Array, ...]:
    """Place arrays with their batch axis sharded over the data axis."""
    out = tuple(
        jax.device_put(a, batch_sharding(mesh, np.ndim(a))) for a in arrays
    )
    return out if len(out) > 1 else out[0]


def replicate_state(mesh: Mesh, tree: Any) -> Any:
    """Replicate a pytree (e.g. GANTrainState) across the mesh."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
