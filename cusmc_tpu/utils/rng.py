"""Deterministic RNG discipline.

The reference reseeds curand from ``time()`` on every kernel call
(``/root/reference/src/mvn_dist.cu.cpp:187-189``) and shares one mt19937
across OpenMP threads (``src/samplers.cpp:11``) — irreproducible and racy.
Here every random draw derives from a counter-based key tree: stable across
reruns, jit/non-jit, and re-sharding (SURVEY.md §7 hard parts).
"""

from __future__ import annotations

import jax


def step_key(key: jax.Array, t) -> jax.Array:
    """Key for timestep t: fold_in keeps the schedule independent of layout."""
    return jax.random.fold_in(key, t)


def phase_keys(key: jax.Array, n: int = 3):
    """Split a step key into per-phase keys (resample, propagate, ...)."""
    return jax.random.split(key, n)


def shard_key(key: jax.Array, axis_name: str) -> jax.Array:
    """Decorrelate a replicated key across mesh shards inside shard_map."""
    return jax.random.fold_in(key, jax.lax.axis_index(axis_name))
