"""Systematic / stratified / multinomial resamplers.

The reference ships only the Metropolis resampler (its registry at
``/root/reference/inst/include/types.hpp:32-34`` has one entry, registered at
``src/mcmc.cpp:293-295``). These are the north-star extensions
(BASELINE.json: "systematic resampling"): low-variance resamplers built on a
normalized-weight CDF. All operate on log-weights and return int32 ancestor
indices [N].

All three CDF resamplers factor as (sorted positions in [0,1)) x (inverse
CDF). The position generators are exposed in ``POSITION_FNS`` so the packed
filter path can feed them to the fused window-walk kernel
(``cusmc_tpu.ops.monotone_gather.inverse_cdf_apply``) which computes
ancestors in-kernel AND applies them in one HBM pass. The functions here
use the XLA rank-by-merge inversion (no searchsorted binary search, which
costs ~160 ms at N=1M on v5e) and are the CPU/batch-layout/oracle path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _normalized_weights(log_weights: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.softmax(log_weights)


def _inverse_cdf(positions: jnp.ndarray, log_weights: jnp.ndarray) -> jnp.ndarray:
    """Ancestors a_i with cdf[a_i - 1] <= positions_i < cdf[a_i], for
    SORTED positions (all resamplers here produce sorted positions by
    construction).

    Rank-by-merge instead of searchsorted: in the ascending stable merge
    of [cdf, positions], position i lands at index (#cdf <= p_i) + i, so
    a_i = merged_rank(p_i) - i. Two argsorts and slice ops — searchsorted's
    binary search is ~20 rounds of random gathers and measured 160 ms at
    N=1M on v5e versus ~4 ms for the argsorts."""
    n = log_weights.shape[0]
    cdf = jnp.cumsum(_normalized_weights(log_weights))
    a = _merge_rank(cdf, positions)
    # Clip guards the final bin (cdf[-1] may round below 1.0 in f32).
    return jnp.clip(a, 0, n - 1).astype(jnp.int32)


def _merge_rank(sorted_ref: jnp.ndarray, sorted_queries: jnp.ndarray
                ) -> jnp.ndarray:
    """#(sorted_ref <= q_i) for each sorted query (searchsorted
    side='right' semantics without the binary-search gathers): the stable
    ascending merge puts ref entries before equal queries, so query i's
    merged rank is (#ref <= q_i) + i."""
    m = sorted_ref.shape[0]
    merged = jnp.concatenate(
        [sorted_ref, sorted_queries.astype(sorted_ref.dtype)])
    order = jnp.argsort(merged)
    rank = jnp.argsort(order)
    return rank[m:] - jnp.arange(sorted_queries.shape[0])


def systematic_positions(key: jax.Array, n: int, dtype=jnp.float32
                         ) -> jnp.ndarray:
    """One shared uniform offset: positions (i + u)/N. Lowest variance."""
    u = jax.random.uniform(key, (), dtype=dtype)
    return (jnp.arange(n, dtype=dtype) + u) / n


def stratified_positions(key: jax.Array, n: int, dtype=jnp.float32
                         ) -> jnp.ndarray:
    """Independent uniform per stratum: positions (i + u_i)/N."""
    u = jax.random.uniform(key, (n,), dtype=dtype)
    return (jnp.arange(n, dtype=dtype) + u) / n


def systematic_ancestors(key: jax.Array, log_weights: jnp.ndarray) -> jnp.ndarray:
    """Systematic resampling (shared offset); see ``systematic_positions``."""
    n = log_weights.shape[0]
    return _inverse_cdf(systematic_positions(key, n, log_weights.dtype),
                        log_weights)


def stratified_ancestors(key: jax.Array, log_weights: jnp.ndarray) -> jnp.ndarray:
    """Stratified resampling (per-stratum offsets)."""
    n = log_weights.shape[0]
    return _inverse_cdf(stratified_positions(key, n, log_weights.dtype),
                        log_weights)


def sorted_uniforms(key: jax.Array, n: int, dtype=jnp.float32) -> jnp.ndarray:
    """Order statistics of n iid U(0,1) draws, generated DIRECTLY sorted
    via exponential spacings (u_(i) = S_i / S_{n+1}, S = cumsum of Exp(1))
    — no sort, no N^2 anything."""
    e = -jnp.log(jax.random.uniform(key, (n + 1,), dtype,
                                    minval=jnp.finfo(dtype).tiny))
    s = jnp.cumsum(e)
    return s[:n] / s[n]


def multinomial_ancestors(key: jax.Array, log_weights: jnp.ndarray) -> jnp.ndarray:
    """IID draws from the weight distribution (highest variance, simplest).

    Implemented by inverse-CDF at sorted uniform order statistics — the
    ancestor MULTISET is exactly multinomial, returned in sorted order
    (resampling is exchangeable, so any order is valid). The obvious
    ``jax.random.categorical(key, logw, shape=(n,))`` materializes an
    [n, n] Gumbel tensor — 4 TB at n=1M; it crashed the TPU compiler
    before this formulation."""
    n = log_weights.shape[0]
    return _inverse_cdf(sorted_uniforms(key, n, log_weights.dtype),
                        log_weights)


# Sorted-position generators for the fused inverse-CDF kernel
# (ops/monotone_gather.inverse_cdf_apply): (key, n, dtype) -> positions [n].
POSITION_FNS = {
    "systematic": systematic_positions,
    "stratified": stratified_positions,
    "multinomial": sorted_uniforms,
}


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
    # Deterministic slots j < n_det: ancestor = inverse CDF of copy counts
    # (merge-rank; slots are sorted integers).
    ccum = jnp.cumsum(counts)
    slots = jnp.arange(n)
    det = _merge_rank(ccum, slots.astype(ccum.dtype))
    det = jnp.minimum(det, n - 1).astype(jnp.int32)
    # Residual slots j >= n_det: multinomial on the fractional parts. The
    # draws must be UNSORTED (only a traced-size tail of them is used;
    # the tail of a sorted sample is order statistics — biased high), so
    # this piece uses the searchsorted inverse-CDF with iid uniforms.
    # (jax.random.categorical would build an [n, n] Gumbel tensor — 4 TB
    # at n=1M; it crashed the TPU compiler before this formulation.)
    resid = jnp.maximum(nw - counts, jnp.finfo(w.dtype).tiny)
    rcdf = jnp.cumsum(resid / jnp.sum(resid))
    rcdf = rcdf.at[-1].set(jnp.asarray(1.0, rcdf.dtype)
                           + jnp.finfo(rcdf.dtype).eps)
    u = jax.random.uniform(key, (n,), w.dtype)
    res = jnp.searchsorted(rcdf, u, side="right").astype(jnp.int32)
    res = jnp.minimum(res, n - 1)
    return jnp.where(slots < n_det, det, res)
