"""VGG-style WGAN critic (TPU-native).

Capability parity with the reference critic
(``DoWnGAN/networks/critic.py:9-106``): eight 3x3 convs with channel
multipliers {1,1,2,2,4,4,8,8} x base and strides {1,2}x4 (spatial /16),
LeakyReLU(0.2) activations, then Dense(100) -> LeakyReLU -> Dense(1).
Unconditional: scores only the fine field (never sees the covariates),
matching the reference. Florida workload: (B,128,128,2) -> (B,1),
1,112,313 params. Only the first conv has a bias, as in the reference.

NHWC layout; the flatten before the classifier is in NHWC order (the
weight-porting utility permutes the reference's NCHW-flattened Dense
kernel accordingly — see ``downgan_tpu.utils.port_weights``).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from downgan_tpu.models.layers import (
    Conv3x3,
    RowShardedDense,
    leaky_relu,
    torch_conv_bias_init,
    torch_dense_kernel_init,
)

Dtype = Any

_CRITIC_SLOPE = 0.2


class Critic(nn.Module):
    """WGAN critic over fine-resolution fields, NHWC.

    ``base`` is the reference's ``coarse_dim`` (16 for florida);
    ``fine_size`` the fine spatial extent (128). The classifier input width
    is base*8 * (fine_size/16)**2.
    """

    base: int = 16
    fine_size: int = 128
    dtype: Dtype = jnp.float32
    # Exact spatially-sharded evaluation (see parallel/spatial.py): convs
    # halo-exchange over this mesh axis; the classifier becomes a
    # row-parallel matmul completed by a psum. Same parameter tree either
    # way. Requires fine_size/16 divisible by n_spatial_shards.
    spatial_axis: str | None = None
    n_spatial_shards: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = x.astype(self.dtype)
        specs = [
            (self.base, 1, True),
            (self.base, 2, False),
            (2 * self.base, 1, False),
            (2 * self.base, 2, False),
            (4 * self.base, 1, False),
            (4 * self.base, 2, False),
            (8 * self.base, 1, False),
            (8 * self.base, 2, False),
        ]
        for i, (feat, stride, bias) in enumerate(specs):
            x = Conv3x3(feat, stride=stride, use_bias=bias, dtype=self.dtype,
                        name=f"conv{i}", spatial_axis=self.spatial_axis)(x)
            x = leaky_relu(x, _CRITIC_SLOPE)

        x = x.reshape(x.shape[0], -1)
        if self.spatial_axis is not None:
            x = RowShardedDense(
                100,
                n_shards=self.n_spatial_shards,
                axis_name=self.spatial_axis,
                dtype=self.dtype,
                name="fc1",
            )(x)
        else:
            x = nn.Dense(
                100,
                kernel_init=torch_dense_kernel_init(),
                bias_init=torch_conv_bias_init(x.shape[-1]),
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="fc1",
            )(x)
        x = leaky_relu(x, _CRITIC_SLOPE)
        x = nn.Dense(
            1,
            kernel_init=torch_dense_kernel_init(),
            bias_init=torch_conv_bias_init(100),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="fc2",
        )(x)
        return x.astype(jnp.float32)
