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

import functools
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from downgan_tpu.models.layers import (
    Conv3x3,
    leaky_relu,
    pixel_shuffle,
    torch_conv_bias_init,
    torch_conv_kernel_init,
)

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


class PReLU(nn.Module):
    """Parametric ReLU with a single learnable slope (torch nn.PReLU
    default: one parameter, init 0.25)."""

    init: float = 0.25

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        alpha = self.param("alpha", lambda k, s: jnp.full(s, self.init), (1,))
        return jnp.where(x >= 0, x, alpha * x)


class BatchNorm(nn.Module):
    """Stateless per-sample (instance) normalization with BN's learnable
    scale/bias.

    The reference's SRGAN variant uses nn.BatchNorm2d, but that variant
    never ran upstream (commented out, ``networks/generator.py:93-204``),
    so the semantics are ours to pin. Per-BATCH statistics would make a
    sample's output depend on the rest of its batch — nondeterministic
    serving under request coalescing, metrics that shift with test-batch
    partitioning, and padded samples in chunked inference polluting real
    ones. Normalizing each sample by its own spatial statistics is
    batch-size-invariant and identical in training and inference, and
    keeps the train state pure (running statistics would add a mutable
    collection). Same parameter tree as BN (scale/bias per channel).
    """

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", lambda k, s: jnp.ones(s), (c,))
        bias = self.param("bias", lambda k, s: jnp.zeros(s), (c,))
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias


class SRResNetBlock(nn.Module):
    """conv -> PReLU -> conv + input (reference ResidualBlock,
    ``networks/generator.py:182-204``; convs bias-free)."""

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        out = Conv3x3(self.channels, use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = PReLU(name="prelu")(out)
        out = Conv3x3(self.channels, use_bias=False, dtype=self.dtype, name="conv2")(out)
        return out + x


class SRResNetGenerator(nn.Module):
    """SRGAN-style generator — the reference's commented-out second model
    family (``networks/generator.py:93-204``) made real: 9x9 conv + PReLU
    -> 16 residual blocks -> 3x3 conv (no bias) + BN + global skip ->
    num_upsample x [conv 4f, pixel-shuffle, PReLU] -> 9x9 output conv.
    NHWC; same (coarse, fine) contract as :class:`Generator`.
    """

    filters: int = 16
    n_predictands: int = 2
    num_res_blocks: int = 16
    num_upsample: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = x.astype(self.dtype)
        cin = x.shape[-1]
        conv9 = functools.partial(
            nn.Conv, kernel_size=(9, 9), padding=((4, 4), (4, 4)),
            dtype=self.dtype, param_dtype=jnp.float32,
        )
        out1 = conv9(
            features=self.filters,
            kernel_init=torch_conv_kernel_init(),
            bias_init=torch_conv_bias_init(81 * cin),
            name="conv1",
        )(x)
        out1 = PReLU(name="prelu1")(out1)

        out = out1
        for i in range(self.num_res_blocks):
            out = SRResNetBlock(self.filters, dtype=self.dtype, name=f"res{i}")(out)

        out = Conv3x3(self.filters, use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = BatchNorm(name="bn2")(out)
        out = out1 + out

        for i in range(self.num_upsample):
            out = Conv3x3(self.filters * 4, use_bias=False, dtype=self.dtype,
                          name=f"up{i}")(out)
            out = pixel_shuffle(out, 2)
            out = PReLU(name=f"up_prelu{i}")(out)

        out = conv9(
            features=self.n_predictands,
            kernel_init=torch_conv_kernel_init(),
            bias_init=torch_conv_bias_init(81 * self.filters),
            name="conv3",
        )(out)
        return out.astype(jnp.float32)
