"""Chunked streaming particle filter: device scans K steps at a time,
history streams to a host-side arena between chunks.

The reference holds the entire T x N x d history in RAM
(``/root/reference/src/run.rcpp.cpp:80-97``) — at TPU scale (N=1M, T=1000)
that is 8 GB/dim and cannot live in HBM. Here the scan carry stays on
device across chunks (no re-initialization), only the [K, N, d] history
block crosses to the host per chunk, into ``TrajectoryStore``'s
preallocated arena (native memcpy, no per-step Python).

This is also the checkpoint/resume boundary: the carry returned per chunk
is exactly what ``cusmc_tpu.checkpoint`` snapshots (SURVEY.md §5).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from cusmc_tpu.diagnostics.metrics import effective_sample_size
from cusmc_tpu.io.native_store import TrajectoryStore
from cusmc_tpu.models.dlm import DLM
from cusmc_tpu.resampling import get_resampler
from cusmc_tpu.smc.particle_filter import (
    FilterResult,
    _step_factory,
    local_resample_op,
    packed_resample_op,
)


def streaming_bootstrap_filter(
    key: jax.Array,
    model: DLM,
    ys: np.ndarray,
    num_particles: int,
    chunk_steps: int = 64,
    resampler: str = "metropolis",
    resampler_kwargs: Optional[dict] = None,
    ess_threshold: Optional[float] = None,
    store_particles: bool = True,
    force_numpy_store: bool = False,
    spill_path: Optional[str] = None,
    checkpoint=None,
    checkpoint_every: Optional[int] = None,
    resume: bool = False,
    layout: str = "packed",
    halt_on_nonfinite: bool = True,
):
    """Run the filter over ``ys`` [T, k] in chunks of ``chunk_steps``.

    Returns ``(FilterResult, particle_store)`` where the FilterResult's
    in-HBM history fields are None and ``particle_store`` is a
    ``TrajectoryStore`` holding the streamed [T, N, d] particle history
    (None when ``store_particles=False``).

    ``checkpoint`` (a ``cusmc_tpu.checkpoint.FilterCheckpoint``) snapshots
    the carry every ``checkpoint_every`` steps (default: every chunk);
    ``resume=True`` restores the latest snapshot and continues from its
    step. Particle history before the resume point is NOT replayed: the
    store's row i then corresponds to timestep ``store.start_step + i``
    (0 for fresh runs), and the returned ``ess`` likewise starts at the
    resume point.

    ``halt_on_nonfinite`` is the snapshot-and-halt failure guard
    (SURVEY.md §5 "failure detection / elastic recovery"): each chunk
    boundary verifies the carry weights and evidence increments are
    finite; on degeneration the LAST-GOOD carry is auto-saved to
    ``checkpoint`` (when wired) and ``FilterDivergedError`` is raised
    with the last good step + snapshot path. A later call with
    ``resume=True`` (after fixing the observations) continues from the
    clean prefix with results identical to an uninterrupted run.
    """
    from cusmc_tpu.models.base import supports_packed

    resampler_kwargs = resampler_kwargs or {}
    if layout == "packed" and not supports_packed(model):
        layout = "batch"
    if layout == "packed":
        resample_op = packed_resample_op(resampler, num_particles,
                                         **resampler_kwargs)
        propagate_fn = model.propagate_packed
        logpdf_fn = model.observation_logpdf_packed
    else:
        res_fn = get_resampler(resampler, **resampler_kwargs)
        resample_op = local_resample_op(res_fn, num_particles)
        propagate_fn = model.propagate
        logpdf_fn = model.observation_logpdf
    step = _step_factory(propagate_fn, logpdf_fn, resample_op, ess_threshold,
                         num_particles, axis_name=None, return_history=True)
    dtype = model.G.dtype
    d = model.state_dim
    num_steps = ys.shape[0]

    @jax.jit
    def run_chunk(carry, ts, ys_chunk):
        return lax.scan(step, carry, (ts, ys_chunk))

    packed = layout == "packed"
    k_init, k_scan = jax.random.split(key)
    if packed:
        x0 = model.sample_initial_packed(k_init, num_particles)
    else:
        x0 = model.sample_initial(k_init, (num_particles,))
    logw0 = jnp.full((num_particles,), -math.log(num_particles), dtype)
    carry = (x0, logw0, k_scan)
    log_evidence = 0.0
    t = 1

    if resume:
        if checkpoint is None:
            raise ValueError("resume=True requires a checkpoint")
        snap = checkpoint.restore()
        # Checkpoints store particles in public [N, d] layout.
        x_r = snap["particles"].astype(dtype)
        carry = (x_r.T if packed else x_r,
                 snap["log_weights"].astype(dtype), snap["key"])
        log_evidence = snap["log_evidence"]
        t = snap["t"] + 1

    def to_rows(x):  # carry layout -> public [N, d]
        return np.asarray(x, np.float32).T if packed else np.asarray(x, np.float32)

    store = None
    if store_particles:
        if spill_path is not None:
            # Out-of-core: history appends to disk via the native async
            # writer (io/disk_store.py) — use when T*N*d exceeds host RAM.
            from cusmc_tpu.io.disk_store import DiskTrajectoryStore

            store = DiskTrajectoryStore(spill_path, (num_particles, d),
                                        np.float32)
        else:
            store = TrajectoryStore((num_particles, d), num_steps,
                                    np.float32,
                                    force_numpy=force_numpy_store)
        # Row i of the store corresponds to timestep start_step + i (on a
        # resumed run history before the snapshot is not replayed).
        store.start_step = t - 1
        store.append(to_rows(carry[0])[None])

    ess_all = [np.asarray(effective_sample_size(carry[1]))[None]]
    ys = np.asarray(ys)
    next_ckpt = None
    if checkpoint is not None:
        checkpoint_every = checkpoint_every or chunk_steps
        next_ckpt = t - 1 + checkpoint_every

    while t < num_steps:
        k = min(chunk_steps, num_steps - t)
        ts = jnp.arange(t, t + k)
        ys_chunk = jnp.asarray(ys[t:t + k], dtype)
        prev_carry, prev_le, prev_t = carry, log_evidence, t
        carry, ((xs, _lls, _ancs), esss, lzs) = run_chunk(carry, ts, ys_chunk)
        if halt_on_nonfinite:
            lw_np = np.asarray(carry[1])
            lz_np = np.asarray(lzs)
            bad = (np.isnan(lw_np).any() or np.all(np.isneginf(lw_np))
                   or not np.isfinite(lz_np).all())
            if bad:
                from cusmc_tpu.utils.debug import FilterDivergedError

                snap = None
                if checkpoint is not None:
                    x_g, logw_g, key_g = prev_carry
                    snap = checkpoint.save(prev_t - 1, to_rows(x_g), logw_g,
                                           key_g, prev_le)
                raise FilterDivergedError(
                    f"non-finite filter state in steps "
                    f"[{prev_t}, {prev_t + k}); last good step "
                    f"{prev_t - 1}"
                    + (f", snapshot saved to {snap}" if snap else ""),
                    last_good_step=prev_t - 1, snapshot=snap)
        if store is not None:
            xs_np = np.asarray(xs, np.float32)
            store.append(np.swapaxes(xs_np, 1, 2) if packed else xs_np)
        ess_all.append(np.asarray(esss))
        log_evidence += float(jnp.sum(lzs))
        t += k
        if next_ckpt is not None and t - 1 >= next_ckpt:
            x_c, logw_c, key_c = carry
            checkpoint.save(t - 1, to_rows(x_c), logw_c, key_c, log_evidence)
            next_ckpt = t - 1 + checkpoint_every

    x_f, logw_f, _ = carry
    if packed:
        x_f = x_f.T
    result = FilterResult(
        final_particles=x_f,
        final_log_weights=logw_f,
        ess=jnp.asarray(np.concatenate(ess_all)),
        log_evidence=jnp.asarray(log_evidence),
    )
    return result, store
