"""Ensemble (probabilistic) verification metrics.

Companions to the stochastic generator (``Config.noise_channels``): score
a K-member ensemble against the observed field. No reference equivalent —
the reference generator is deterministic (``networks/generator.py:83-90``)
so its metric registry is purely pointwise.

CRPS uses the FAIR (unbiased) ensemble estimator (Ferro 2008):

    CRPS = E|X - y| - (1 / (2 M (M-1))) * sum_{i,j} |x_i - x_j|

which estimates the CRPS of the underlying forecast distribution rather
than of the M-member empirical one (the naive 1/(2M^2) estimator rewards
under-dispersion). For a degenerate ensemble (all members equal) it
reduces exactly to MAE, so CRPS < MAE means the spread is informative.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def crps_ensemble(members: jax.Array, truth: jax.Array) -> jax.Array:
    """Fair CRPS of an (M, ...) ensemble against truth (...), averaged
    over every field point. O(M^2) in member pairs — M is small (an
    ensemble, not a batch axis)."""
    members = jnp.asarray(members)
    truth = jnp.asarray(truth)
    m = members.shape[0]
    term1 = jnp.mean(jnp.abs(members - truth[None]), axis=0)
    if m < 2:
        return jnp.mean(term1)
    pair = jnp.abs(members[:, None] - members[None, :])
    term2 = jnp.sum(pair, axis=(0, 1)) / (2.0 * m * (m - 1))
    return jnp.mean(term1 - term2)


def ensemble_spread(members: jax.Array) -> jax.Array:
    """Mean per-point ensemble standard deviation (ddof=1 to pair with the
    fair CRPS convention). Zero for a deterministic model."""
    members = jnp.asarray(members)
    if members.shape[0] < 2:
        return jnp.zeros(())
    return jnp.mean(jnp.std(members, axis=0, ddof=1))
