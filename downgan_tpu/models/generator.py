"""ESRGAN-style residual-in-residual dense generator (TPU-native).

Capability parity with the reference generator
(``DoWnGAN/networks/generator.py:14-90``): conv -> N x RRDB -> conv +
global residual -> K x [conv(4f), LeakyReLU, pixel-shuffle(2)] -> conv head.
Florida workload: (B,16,16,7) -> (B,128,128,2), 1,696,514 params.

TPU-first design decisions (not a translation):
  * NHWC layout end-to-end (native TPU conv layout); NCHW accepted only at
    the API edge via ``downgan_tpu.models.layers.nchw_to_nhwc``.
  * PixelShuffle is a reshape/transpose (depth-to-space) that XLA fuses
    with the adjacent convolutions — no gather/scatter.
  * The five dense-block convs consume concatenated features; we
    concatenate on the minor-most (channel) axis so the concat is a free
    layout operation under XLA.
  * fp32 params, configurable compute dtype (bf16 fast path on the MXU).
  * ``jax.checkpoint``-able: the module is pure; rematerialization policy
    is applied by the trainer, not baked in here.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from downgan_tpu.models.layers import Conv3x3, leaky_relu, pixel_shuffle

Dtype = Any

# torch nn.LeakyReLU() default slope, used throughout the reference generator.
_GEN_SLOPE = 0.01


class DenseResidualBlock(nn.Module):
    """Residual dense block: 5 conv stages over growing concatenations.

    Stage i convolves concat(x, out_1..out_{i-1}) (i*filters channels) down
    to ``filters`` channels; LeakyReLU on all but the last; the final output
    is scaled by ``res_scale`` and added to the block input.
    (Reference: ``networks/generator.py:14-41``.)
    """

    filters: int
    res_scale: float = 0.2
    dtype: Dtype = jnp.float32
    spatial_axis: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        inputs = x
        out = x
        for i in range(5):
            out = Conv3x3(self.filters, dtype=self.dtype, name=f"b{i + 1}",
                          spatial_axis=self.spatial_axis)(inputs)
            if i < 4:
                out = leaky_relu(out, _GEN_SLOPE)
            if i < 4:
                inputs = jnp.concatenate([inputs, out], axis=-1)
        return out * self.res_scale + x


class RRDB(nn.Module):
    """Residual-in-residual dense block: 3 DRBs with an outer scaled skip.

    (Reference: ``networks/generator.py:44-53``.)
    """

    filters: int
    res_scale: float = 0.2
    dtype: Dtype = jnp.float32
    spatial_axis: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        out = x
        for i in range(3):
            out = DenseResidualBlock(self.filters, dtype=self.dtype, name=f"drb{i}",
                                     spatial_axis=self.spatial_axis)(out)
        return out * self.res_scale + x


class Generator(nn.Module):
    """RRDB super-resolution generator, NHWC.

    Args mirror the reference constructor
    (``networks/generator.py:58``): ``filters`` (=coarse dim, 16 for
    florida), ``n_predictands`` output channels, ``num_res_blocks`` RRDBs,
    ``num_upsample`` 2x pixel-shuffle stages (3 -> 8x super-resolution).
    Input channel count is inferred from the data.
    """

    filters: int = 16
    n_predictands: int = 2
    num_res_blocks: int = 16
    num_upsample: int = 3
    dtype: Dtype = jnp.float32
    remat: bool = False
    # mesh axis name for exact spatially-sharded evaluation (see
    # parallel/spatial.py sharded_generator_apply); None = local conv.
    spatial_axis: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = x.astype(self.dtype)
        out1 = Conv3x3(self.filters, dtype=self.dtype, name="conv1",
                       spatial_axis=self.spatial_axis)(x)

        block = RRDB
        if self.remat:
            block = nn.remat(RRDB)
        out = out1
        for i in range(self.num_res_blocks):
            out = block(self.filters, dtype=self.dtype, name=f"rrdb{i}",
                        spatial_axis=self.spatial_axis)(out)

        out2 = Conv3x3(self.filters, dtype=self.dtype, name="conv2",
                       spatial_axis=self.spatial_axis)(out)
        out = out1 + out2

        for i in range(self.num_upsample):
            out = Conv3x3(self.filters * 4, dtype=self.dtype, name=f"up{i}",
                          spatial_axis=self.spatial_axis)(out)
            out = leaky_relu(out, _GEN_SLOPE)
            out = pixel_shuffle(out, 2)

        out = Conv3x3(self.filters, dtype=self.dtype, name="head1",
                      spatial_axis=self.spatial_axis)(out)
        out = leaky_relu(out, _GEN_SLOPE)
        out = Conv3x3(self.n_predictands, dtype=self.dtype, name="head2",
                      spatial_axis=self.spatial_axis)(out)
        return out.astype(jnp.float32)
