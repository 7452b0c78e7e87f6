"""Shared layer utilities for downgan_tpu models.

All models run in NHWC — the native TPU convolution layout — with fp32
parameters and a configurable compute dtype (bf16 fast path). Initializers
reproduce the torch Conv2d/Linear defaults (Kaiming-uniform with a=sqrt(5),
which reduces to U(-1/sqrt(fan_in), +1/sqrt(fan_in)) for both weight and
bias) so that training dynamics are statistically comparable to the
reference networks (``DoWnGAN/networks/generator.py``, ``critic.py``).
"""
from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def torch_conv_kernel_init(dtype: Dtype = jnp.float32) -> Callable:
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) over HWIO kernels (torch default)."""

    def init(key: jax.Array, shape: Sequence[int], _dtype: Dtype = dtype) -> jax.Array:
        kh, kw, cin, _ = shape
        bound = 1.0 / jnp.sqrt(kh * kw * cin)
        return jax.random.uniform(key, shape, _dtype, -bound, bound)

    return init


def torch_conv_bias_init(fan_in: int, dtype: Dtype = jnp.float32) -> Callable:
    def init(key: jax.Array, shape: Sequence[int], _dtype: Dtype = dtype) -> jax.Array:
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, _dtype, -bound, bound)

    return init


def torch_dense_kernel_init(dtype: Dtype = jnp.float32) -> Callable:
    def init(key: jax.Array, shape: Sequence[int], _dtype: Dtype = dtype) -> jax.Array:
        fan_in = shape[0]
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, _dtype, -bound, bound)

    return init


class Conv3x3(nn.Module):
    """3x3 convolution with torch-parity explicit padding and init.

    Torch's Conv2d(stride=2, padding=1) pads (1,1) on both sides and floors;
    XLA's 'SAME' would pad (0,1) for even inputs, sampling different pixels.
    Explicit ((1,1),(1,1)) padding keeps the two numerically identical.

    ``spatial_axis``: when set (and called inside a ``shard_map`` over that
    mesh axis with the H dimension sharded), the H padding comes from a
    one-row halo exchange with the neighbouring shards instead of zeros —
    the sharded conv is then bit-identical to the unsharded one (zeros
    still pad the true domain edges). Stride-2 requires an even local H.
    """

    features: int
    stride: int = 1
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    spatial_axis: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        h_pad = (1, 1)
        if self.spatial_axis is not None:
            from downgan_tpu.parallel.spatial import halo_exchange

            if self.stride == 2 and x.shape[1] % 2:
                raise ValueError(
                    f"stride-2 sharded conv needs an even local H, got "
                    f"{x.shape[1]} rows per shard — use fewer spatial shards"
                )
            x = halo_exchange(x, self.spatial_axis, halo=1)
            h_pad = (0, 0)
        y = nn.Conv(
            features=self.features,
            kernel_size=(3, 3),
            strides=(self.stride, self.stride),
            padding=(h_pad, (1, 1)),
            use_bias=self.use_bias,
            kernel_init=torch_conv_kernel_init(),
            bias_init=torch_conv_bias_init(9 * cin),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        return y


def leaky_relu(x: jax.Array, negative_slope: float) -> jax.Array:
    return jnp.where(x >= 0, x, negative_slope * x)


def pixel_shuffle(x: jax.Array, factor: int = 2) -> jax.Array:
    """Depth-to-space with torch ``nn.PixelShuffle`` channel ordering.

    NHWC input (B, H, W, C*r*r) -> (B, H*r, W*r, C), where channel index
    c*r*r + i*r + j scatters to output (h*r+i, w*r+j, c) — matching torch
    semantics (used at reference ``networks/generator.py:72``) so ported
    weights are bit-compatible. Pure reshape/transpose: XLA lowers this to
    a layout change fused with the surrounding convs.
    """
    b, h, w, c = x.shape
    r = factor
    cout = c // (r * r)
    x = x.reshape(b, h, w, cout, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, i, w, j, cout
    return x.reshape(b, h * r, w * r, cout)


def upsample_nearest(x: jax.Array, factor: int) -> jax.Array:
    """Nearest-neighbour spatial upsample of an NHWC batch by an integer
    factor: (B, H, W, C) -> (B, H*f, W*f, C).

    Static-shape broadcast+reshape (no gather): XLA lowers it to a cheap
    layout expansion. Used to lift the coarse covariate stack onto the
    fine grid for the conditional critic (``Config.critic_conditional``).
    """
    b, h, w, c = x.shape
    f = factor
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, f, w, f, c))
    return x.reshape(b, h * f, w * f, c)


def space_to_depth(x: jax.Array, factor: int = 2) -> jax.Array:
    """Inverse of :func:`pixel_shuffle` (same channel ordering)."""
    b, h, w, c = x.shape
    r = factor
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # b, h', w', c, i, j
    return x.reshape(b, h // r, w // r, c * r * r)


def nchw_to_nhwc(x: jax.Array) -> jax.Array:
    return jnp.transpose(x, (0, 2, 3, 1))


def nhwc_to_nchw(x: jax.Array) -> jax.Array:
    return jnp.transpose(x, (0, 3, 1, 2))


class RowShardedDense(nn.Module):
    """Dense layer over a feature axis row-sharded across a mesh axis.

    The input's feature axis is the local slice of a globally flattened
    vector whose rows are distributed over ``n_shards`` devices in order
    (e.g. an H-sharded NHWC activation flattened per shard). The kernel is
    replicated at full global width; each device multiplies its input
    slice by its kernel row-block and a ``psum`` over ``axis_name``
    completes the matmul — parameters stay bit-compatible with the
    unsharded ``nn.Dense`` of the same name.
    """

    features: int
    n_shards: int
    axis_name: str
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_loc: jax.Array) -> jax.Array:
        local_in = x_loc.shape[-1]
        full_in = local_in * self.n_shards
        kernel = self.param(
            "kernel", torch_dense_kernel_init(), (full_in, self.features)
        )
        bias = self.param("bias", torch_conv_bias_init(full_in), (self.features,))
        idx = jax.lax.axis_index(self.axis_name)
        k_loc = jax.lax.dynamic_slice(
            kernel, (idx * local_in, 0), (local_in, self.features)
        )
        partial = x_loc.astype(self.dtype) @ k_loc.astype(self.dtype)
        return jax.lax.psum(partial, self.axis_name) + bias
