"""Fused DenseResidualBlock forward as a single Pallas TPU kernel.

One DRB (reference ``DoWnGAN/networks/generator.py:14-41``; flax re-design
``downgan_tpu/models/generator.py``) is five 3x3 convs over growing channel
concatenations at 16x16 spatial with cout=16. Under XLA each conv round-trips
activations through HBM; here the whole block runs out of VMEM.

Layout: activations are (C, S) with channels on sublanes and S = B*H*W
flattened (b, y, x) on lanes — S is a multiple of 128, so lanes are fully
utilized even though C is small. A 3x3 'SAME' conv is 9 shifted matmuls:

    out[co, s] += sum_ci W[dy, dx, ci, co] * act[ci, s + dy*W + dx]

with the shift realized by ``pltpu.roll`` along lanes and border wrap-around
(x or y leaving [0, W)) cancelled by a precomputed lane mask. The dense
concat is free: stage i's output is written into rows [i*F, (i+1)*F) of the
same VMEM buffer that stage i+1 reads as its input.

Weights are packed host-side to (9, F, C_i) per stage (``pack_drb_weights``)
so each shift's matmul is a plain (F, C) @ (C, S) on the MXU.
"""
from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from downgan_tpu.models.layers import leaky_relu

_SLOPE = 0.01  # torch nn.LeakyReLU() default, as in the generator.


def pack_drb_weights(
    params: dict, filters: int
) -> Tuple[List[jax.Array], List[jax.Array]]:
    """Flax DRB params -> ([w9_1..w9_5], [b_1..b_5]).

    ``params`` is the DRB subtree: {'b1': {'Conv_0': {'kernel', 'bias'}}, ...}
    with HWIO kernels (3, 3, C_i, F). Output w9: (9, F, C_i) with
    w9[3*dy + dx, co, ci] = kernel[dy, dx, ci, co].
    """
    ws, bs = [], []
    for k in range(1, 6):
        leaf = params[f"b{k}"]["Conv_0"]
        kern = jnp.asarray(leaf["kernel"])  # (3, 3, C, F)
        w9 = jnp.transpose(kern, (0, 1, 3, 2)).reshape(9, kern.shape[3], kern.shape[2])
        ws.append(w9)
        bs.append(jnp.asarray(leaf["bias"]).reshape(-1, 1))  # (F, 1): 2-D for VMEM
    return ws, bs


def _shift_masks(h: int, w: int, s: int) -> np.ndarray:
    """(9, 1, S) float masks: mask[k, 0, s] = 1 where the (dy, dx) shifted
    source position stays inside the h x w grid. S enumerates (b, y, x)."""
    yy = (np.arange(s) // w) % h
    xx = np.arange(s) % w
    masks = np.empty((9, 1, s), np.float32)
    for k in range(9):
        dy, dx = k // 3 - 1, k % 3 - 1
        masks[k, 0] = ((yy + dy >= 0) & (yy + dy < h) & (xx + dx >= 0) & (xx + dx < w))
    return masks


def _drb_kernel(
    x_ref, w1, w2, w3, w4, w5, b1, b2, b3, b4, b5, masks_ref, out_ref, acts,
    *, filters: int, h: int, w: int,
):
    f = filters
    acts[0:f, :] = x_ref[:]

    ws = (w1, w2, w3, w4, w5)
    bs = (b1, b2, b3, b4, b5)
    res = None
    for i in range(5):
        cin = f * (i + 1)
        acc = jnp.zeros_like(out_ref)
        for k in range(9):
            dy, dx = k // 3 - 1, k % 3 - 1
            shift = dy * w + dx
            src = acts[0:cin, :]
            # roll so that lane s holds source s + shift, then cancel wraps.
            rolled = pltpu.roll(src, -shift % src.shape[1], axis=1)
            masked = rolled * masks_ref[k]
            acc = acc + lax.dot_general(
                ws[i][k], masked,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        acc = acc + bs[i][:]
        if i < 4:
            acts[f * (i + 1) : f * (i + 2), :] = leaky_relu(acc, _SLOPE)
        else:
            res = acc
    out_ref[:] = res * 0.2 + x_ref[:]


@functools.partial(jax.jit, static_argnames=("filters", "h", "w", "interpret"))
def drb_forward(
    x_cs: jax.Array,
    ws: Sequence[jax.Array],
    bs: Sequence[jax.Array],
    filters: int = 16,
    h: int = 16,
    w: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """Fused DRB forward. ``x_cs``: (F, S) channel-major activations with
    S = B*h*w; ``ws``/``bs`` from :func:`pack_drb_weights`."""
    f, s = x_cs.shape
    assert f == filters and s % (h * w) == 0
    masks = jnp.asarray(_shift_masks(h, w, s))

    kernel = functools.partial(_drb_kernel, filters=filters, h=h, w=w)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((f, s), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 11
        + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((5 * f, s), jnp.float32)],
        interpret=interpret,
    )(x_cs, *ws, *bs, masks)


def drb_forward_reference(
    x_cs: jax.Array,
    ws: Sequence[jax.Array],
    bs: Sequence[jax.Array],
    filters: int = 16,
    h: int = 16,
    w: int = 16,
) -> jax.Array:
    """Pure-XLA reference of the same (C, S) formulation, for testing."""
    f, s = x_cs.shape
    masks = jnp.asarray(_shift_masks(h, w, s))
    acts = x_cs
    out = None
    for i in range(5):
        acc = jnp.zeros((f, s), jnp.float32)
        for k in range(9):
            dy, dx = k // 3 - 1, k % 3 - 1
            shift = dy * w + dx
            rolled = jnp.roll(acts, -shift, axis=1)
            acc = acc + ws[i][k] @ (rolled * masks[k])
        acc = acc + bs[i]
        if i < 4:
            acts = jnp.concatenate([acts, leaky_relu(acc, _SLOPE)], axis=0)
        else:
            out = acc
    return out * 0.2 + x_cs


def nhwc_to_cs(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (C, B*H*W)."""
    b, h, w, c = x.shape
    return x.transpose(3, 0, 1, 2).reshape(c, b * h * w)


def cs_to_nhwc(x: jax.Array, b: int, h: int, w: int) -> jax.Array:
    c = x.shape[0]
    return x.reshape(c, b, h, w).transpose(1, 2, 3, 0)
