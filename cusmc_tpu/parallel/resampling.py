"""Distributed resampling over a particle-sharded mesh.

The hard part of sharded SMC (SURVEY.md §7 "Hard parts"): resamplers need
*global* weight information and ancestor states may live on other shards.
Strategy (round 1, "allgather" exchange):

- weights: ``all_gather`` of the log-weight vector — O(N) scalars, cheap
  (4 MB at N=1M f32) and rides ICI;
- ancestor indices: each shard computes ancestors only for its OWN slots,
  from the gathered weights, with a key COMMON to all shards (systematic
  needs one shared uniform; the other resamplers fold the shard index for
  slot-independent streams);
- states: ``all_gather`` of x [N, d] then a local gather. O(N*d) — fine for
  the state dims this framework targets (d <= 128); a ppermute-based
  redistribution that moves only crossing ancestors is the planned
  optimization.

Each op returns GLOBAL ancestor indices, so sharded ancestry logs are
directly comparable with single-device runs.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax


def _global_slots(n_local: int, axis_name: str) -> jnp.ndarray:
    shard = lax.axis_index(axis_name)
    return shard * n_local + jnp.arange(n_local, dtype=jnp.int32)


def _gathered_cdf(logw_global: jnp.ndarray) -> jnp.ndarray:
    cdf = jnp.cumsum(jax.nn.softmax(logw_global))
    return cdf.at[-1].set(jnp.asarray(1.0, cdf.dtype) + jnp.finfo(cdf.dtype).eps)


def make_sharded_ancestor_fn(name: str, axis_name: str, n_global: int,
                             n_local: int, num_steps: int = 10) -> Callable:
    """Build ``(key, logw_global) -> global ancestors [n_local]`` for this
    shard's slots. ``key`` must be identical on all shards."""

    if name == "systematic":
        def fn(key, logw_g):
            u = jax.random.uniform(key, (), logw_g.dtype)  # shared offset
            slots = _global_slots(n_local, axis_name).astype(logw_g.dtype)
            positions = (slots + u) / n_global
            return jnp.searchsorted(_gathered_cdf(logw_g), positions,
                                    side="right").astype(jnp.int32)
    elif name == "stratified":
        def fn(key, logw_g):
            k = jax.random.fold_in(key, lax.axis_index(axis_name))
            u = jax.random.uniform(k, (n_local,), logw_g.dtype)
            slots = _global_slots(n_local, axis_name).astype(logw_g.dtype)
            positions = (slots + u) / n_global
            return jnp.searchsorted(_gathered_cdf(logw_g), positions,
                                    side="right").astype(jnp.int32)
    elif name == "multinomial":
        def fn(key, logw_g):
            k = jax.random.fold_in(key, lax.axis_index(axis_name))
            return jax.random.categorical(k, logw_g,
                                          shape=(n_local,)).astype(jnp.int32)
    elif name == "metropolis":
        def fn(key, logw_g):
            k_shard = jax.random.fold_in(key, lax.axis_index(axis_name))
            init = _global_slots(n_local, axis_name)

            def sweep(b, kcur):
                kb = jax.random.fold_in(k_shard, b)
                kj, ku = jax.random.split(kb)
                j = jax.random.randint(kj, (n_local,), 0, n_global, jnp.int32)
                log_u = jnp.log(jax.random.uniform(ku, (n_local,),
                                                   logw_g.dtype))
                accept = log_u < (logw_g[j] - logw_g[kcur])
                return jnp.where(accept, j, kcur)

            return lax.fori_loop(0, num_steps, sweep, init)
    else:
        raise KeyError(f"no sharded variant of resampler {name!r}")
    return fn


def roll_metropolis_sharded_op(axis_name: str, n_global: int, n_local: int,
                               num_steps: int = 10) -> Callable:
    """Gather-free distributed Metropolis resampling in packed [d, L] layout.

    One global rotation per step (2 ``ppermute`` neighbor exchanges + a
    local roll) re-bases every shard onto a random window of the GLOBAL
    particle array; the B Metropolis sweeps then run shard-locally with the
    coalesced roll scheme (``cusmc_tpu.resampling.rolls``). Equivalent to
    the windowed-Megopolis scheme with window = shard size: each chain is a
    valid Metropolis chain over the weights, and windows re-randomize every
    step. ICI traffic: 2 x (d+1) x L floats per step — independent of B —
    versus the allgather exchange's N x d.

    Returns GLOBAL ancestor indices like the allgather ops.
    """

    num_shards = n_global // n_local
    log_n = math.log(n_global)

    def op(key, X, logw):
        # Common randomness across shards (key is replicated).
        kq, kr, km = jax.random.split(key, 3)
        q = jax.random.randint(kq, (), 0, num_shards)
        r = jax.random.randint(kr, (), 0, n_local)
        p = lax.axis_index(axis_name)

        both = jnp.concatenate([X, logw[None, :]], axis=0)  # [d+1, L]

        def from_shift(shift):
            perm = [((s + shift) % num_shards, s) for s in range(num_shards)]
            return lambda v: lax.ppermute(v, axis_name, perm)

        branches = [from_shift(j) for j in range(num_shards)]
        a_part = lax.switch(q, branches, both)
        b_part = lax.switch((q + 1) % num_shards, branches, both)
        window = jnp.concatenate([a_part, b_part], axis=1)   # [d+1, 2L]
        rotated = lax.dynamic_slice_in_dim(window, r, n_local, axis=1)

        X_rot = rotated[:-1]
        lw_rot = rotated[-1]
        k_shard = jax.random.fold_in(km, p)
        from cusmc_tpu.resampling.rolls import roll_metropolis_sweeps

        x_anc, a_loc = roll_metropolis_sweeps(k_shard, X_rot, lw_rot,
                                              num_steps)
        # Rotated local slot j holds global particle (p*L + j + q*L + r) % N.
        a_global = jax.lax.rem(p * n_local + a_loc + q * n_local + r,
                               n_global)
        return x_anc, jnp.full((n_local,), -log_n, logw.dtype), a_global

    return op


def allgather_resample_op(name: str, axis_name: str, n_global: int,
                          n_local: int, **kwargs) -> Callable:
    """A ``resample_op`` for ``bootstrap_filter`` that resolves global
    ancestry via all-gathered weights and states."""
    ancestor_fn = make_sharded_ancestor_fn(name, axis_name, n_global,
                                           n_local, **kwargs)
    log_n = math.log(n_global)

    def op(key, x, logw):
        logw_g = lax.all_gather(logw, axis_name, tiled=True)       # [N]
        a_global = ancestor_fn(key, logw_g)                        # [n_local]
        x_g = lax.all_gather(x, axis_name, tiled=True)             # [N, d]
        x_anc = x_g[a_global]
        return x_anc, jnp.full((n_local,), -log_n, logw.dtype), a_global

    return op
