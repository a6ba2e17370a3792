"""Systematic / stratified / multinomial resamplers.

The reference ships only the Metropolis resampler (its registry at
``/root/reference/inst/include/types.hpp:32-34`` has one entry, registered at
``src/mcmc.cpp:293-295``). These are the north-star extensions
(BASELINE.json: "systematic resampling"): low-variance resamplers built on a
normalized-weight CDF. All operate on log-weights and return int32 ancestor
indices [N].

The CDF inversion is expressed as a searchsorted over a cumulative sum —
XLA lowers this to a vectorized binary search; a Pallas segmented prefix-sum
variant lives in ``cusmc_tpu.ops`` for the sharded path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _normalized_weights(log_weights: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.softmax(log_weights)


def _inverse_cdf(positions: jnp.ndarray, log_weights: jnp.ndarray) -> jnp.ndarray:
    cdf = jnp.cumsum(_normalized_weights(log_weights))
    # Guard the final bin against rounding (cdf[-1] may be < 1.0 in f32).
    cdf = cdf.at[-1].set(jnp.asarray(1.0, cdf.dtype) + jnp.finfo(cdf.dtype).eps)
    return jnp.searchsorted(cdf, positions, side="right").astype(jnp.int32)


def systematic_ancestors(key: jax.Array, log_weights: jnp.ndarray) -> jnp.ndarray:
    """One shared uniform offset: positions (i + u)/N. Lowest variance."""
    n = log_weights.shape[0]
    u = jax.random.uniform(key, (), dtype=log_weights.dtype)
    positions = (jnp.arange(n, dtype=log_weights.dtype) + u) / n
    return _inverse_cdf(positions, log_weights)


def stratified_ancestors(key: jax.Array, log_weights: jnp.ndarray) -> jnp.ndarray:
    """Independent uniform per stratum: positions (i + u_i)/N."""
    n = log_weights.shape[0]
    u = jax.random.uniform(key, (n,), dtype=log_weights.dtype)
    positions = (jnp.arange(n, dtype=log_weights.dtype) + u) / n
    return _inverse_cdf(positions, log_weights)


def multinomial_ancestors(key: jax.Array, log_weights: jnp.ndarray) -> jnp.ndarray:
    """IID draws from the weight distribution (highest variance, simplest)."""
    n = log_weights.shape[0]
    return jax.random.categorical(key, log_weights, shape=(n,)).astype(jnp.int32)


def residual_ancestors(key: jax.Array, log_weights: jnp.ndarray) -> jnp.ndarray:
    """Residual resampling (Liu & Chen 1998): particle i is copied
    ``floor(N*w_i)`` times deterministically; the remaining
    ``R = N - sum(floor(N*w_i))`` slots are filled by multinomial draws from
    the residual weights ``N*w_i - floor(N*w_i)``. Variance below
    multinomial, randomness below stratified.

    Static-shape formulation (jit/scan-safe): both the deterministic
    inverse-CDF over the copy counts and the residual categorical draws are
    computed for all N slots, then selected by slot index against the
    (traced) deterministic count.
    """
    n = log_weights.shape[0]
    w = _normalized_weights(log_weights)
    nw = n * w
    counts = jnp.floor(nw)
    n_det = counts.sum().astype(jnp.int32)  # traced; <= n
    # Deterministic slots j < n_det: ancestor = inverse CDF of copy counts.
    ccum = jnp.cumsum(counts)
    slots = jnp.arange(n)
    det = jnp.searchsorted(ccum, slots.astype(ccum.dtype), side="right")
    det = jnp.minimum(det, n - 1).astype(jnp.int32)
    # Residual slots j >= n_det: multinomial on the fractional parts.
    # tiny floor keeps the categorical defined when every weight is an
    # exact multiple of 1/N (all residuals zero -> any index is fine).
    resid = jnp.maximum(nw - counts, jnp.finfo(w.dtype).tiny)
    res = jax.random.categorical(key, jnp.log(resid), shape=(n,)).astype(jnp.int32)
    return jnp.where(slots < n_det, det, res)
