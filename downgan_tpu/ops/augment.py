"""On-device, physics-aware training augmentation (no reference equivalent).

Random per-sample mirror flips of the (coarse, fine) field pair inside the
jitted train step. Wind is a VECTOR field, so a mirror is only physical if
the component along the mirrored axis changes sign:

  * lon flip (reverse the W axis): u -> -u at the mirrored position;
  * lat flip (reverse the H axis): v -> -v.

With the sign fix, derived physics are preserved exactly (tested in
tests/test_augment.py): the discrete divergence field of the flipped
pair is the spatial mirror of the original, and vorticity — a
pseudoscalar — is the NEGATED mirror, so all magnitude/spectral
statistics are invariant. A naive image flip (no sign correction)
violates both. Scalar covariates (lsm, sp, sr, z, cape —
config.COVARIATE_NAMES_ORDERED) just mirror.

Both fields of a sample share one flip decision (the pair stays aligned);
decisions are drawn per sample from the step's fold_in stream, so the
augmentation is deterministic given (seed, step) and adds zero host work —
it compiles into the step (two jnp.where selects over mirrored copies).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _axis_flip(x: jax.Array, axis: int, negate_channels: Sequence[int]) -> jax.Array:
    """Mirror ``x`` (NHWC) along ``axis`` and negate the vector components
    whose direction that mirror reverses."""
    sign = jnp.ones((x.shape[-1],), x.dtype)
    if len(negate_channels):
        sign = sign.at[jnp.asarray(tuple(negate_channels))].set(-1)
    return jnp.flip(x, axis=axis) * sign


def random_flip_pair(
    rng: jax.Array,
    coarse: jax.Array,
    fine: jax.Array,
    u_channels_coarse: Sequence[int] = (0,),
    v_channels_coarse: Sequence[int] = (1,),
    u_channels_fine: Sequence[int] = (0,),
    v_channels_fine: Sequence[int] = (1,),
) -> Tuple[jax.Array, jax.Array]:
    """Independent per-sample lon/lat mirror flips of an NHWC batch pair,
    sign-correcting the named u (lon flip) / v (lat flip) channels."""
    lon_rng, lat_rng = jax.random.split(rng)
    b = coarse.shape[0]
    flip_lon = jax.random.bernoulli(lon_rng, 0.5, (b, 1, 1, 1))
    flip_lat = jax.random.bernoulli(lat_rng, 0.5, (b, 1, 1, 1))

    coarse = jnp.where(flip_lon, _axis_flip(coarse, 2, u_channels_coarse), coarse)
    fine = jnp.where(flip_lon, _axis_flip(fine, 2, u_channels_fine), fine)
    coarse = jnp.where(flip_lat, _axis_flip(coarse, 1, v_channels_coarse), coarse)
    fine = jnp.where(flip_lat, _axis_flip(fine, 1, v_channels_fine), fine)
    return coarse, fine


def make_augment(config):
    """Bind the config's vector-channel layout; returns
    ``augment(rng, coarse, fine) -> (coarse, fine)`` for the train step."""
    c = config

    def augment(rng: jax.Array, coarse: jax.Array, fine: jax.Array):
        return random_flip_pair(
            rng, coarse, fine,
            u_channels_coarse=c.u_channels_coarse,
            v_channels_coarse=c.v_channels_coarse,
            u_channels_fine=c.u_channels_fine,
            v_channels_fine=c.v_channels_fine,
        )

    return augment
