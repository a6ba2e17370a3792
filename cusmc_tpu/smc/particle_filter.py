"""Bootstrap particle filter as a single compiled ``lax.scan``.

TPU-native replacement for the reference's driver stack
(``/root/reference/src/run.rcpp.cpp:58-126`` -> ``src/particle_filter.cpp:6-39``
-> ``MCMC`` time loop ``src/mcmc.cpp:239-309``). The reference crosses the
host<->device boundary six times per timestep (H2D/D2H around the sample and
pdf wrappers, with per-call cudaMalloc and a cudaDeviceReset per reweight —
call-stack trace in SURVEY.md §3.1/§3.5); here the whole T-step filter is one
XLA program: body = resample -> propagate -> reweight exactly mirroring
``mcmc.cpp:292-308``.

Two layouts for the scan carry:
- "packed" (default on the hot path): particles as [d, N], N on the 128-lane
  axis, with the gather-free roll-Metropolis resampler — ~100x faster at
  N=1M on TPU v5e (see ops/packed.py and resampling/rolls.py for the
  measurements). Public inputs/outputs remain [N, d] / [T, N, d].
- "batch": particles as [N, d] with index-gather resampling — the layout
  the sharded allgather path and the registry resamplers use directly.

Improvements over the reference (capabilities, not defects — SURVEY.md §7):
- log-space weights (reference multiplies raw densities, ``mcmc.cpp:212``);
- optional ESS-adaptive resampling (reference always resamples);
- log-evidence and per-step ESS outputs (reference computes neither);
- counter-based reproducible RNG.

``axis_name`` threads the same body through ``shard_map`` for the
particle-sharded multi-chip path (``cusmc_tpu.parallel``).
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct
from jax import lax

from cusmc_tpu.diagnostics.metrics import effective_sample_size, log_normalize
from cusmc_tpu.models.dlm import DLM
from cusmc_tpu.ops.fused_step import MAX_MXU_DIM, fused_filter_step
from cusmc_tpu.resampling import get_resampler
from cusmc_tpu.resampling.rolls import roll_metropolis_resample_op


class FilterResult(struct.PyTreeNode):
    """Outputs of one filter run.

    ``particles`` [T, N, d], ``obs_loglik`` [T, N] (the unnormalized
    per-step observation log-likelihood — the log of the reference's raw
    weight arrays ``w_t``, ``src/run.rcpp.cpp:110-125``), ``ancestors``
    [T, N] — all None when ``return_history=False``. ``ess`` [T],
    ``log_evidence`` scalar, plus the final particle cloud.
    """

    final_particles: jnp.ndarray
    final_log_weights: jnp.ndarray
    ess: jnp.ndarray
    log_evidence: jnp.ndarray
    particles: Optional[jnp.ndarray] = None
    obs_loglik: Optional[jnp.ndarray] = None
    ancestors: Optional[jnp.ndarray] = None


def _step_factory(propagate_fn: Callable, logpdf_fn: Callable,
                  resample_op: Callable, ess_threshold: Optional[float],
                  num_particles_global: int, axis_name: Optional[str],
                  return_history: bool = True, debug_checks: bool = False):
    """Build the scan body (layout-agnostic: ``x`` is whatever
    ``propagate_fn``/``resample_op`` operate on).

    ``resample_op(key, x, logw) -> (x_ancestors, logw_after, ancestor_idx)``
    abstracts local vs collective and indexed vs roll-based resampling.
    ``num_particles_global`` is the total N across shards (== local N when
    axis_name is None). The resample key is COMMON across shards (needed for
    globally-consistent systematic positions); the propagate key is folded
    with the shard index so noise is shard-unique.

    ESS-adaptive + sharded: ops exposing a ``pred`` keyword (the ops in
    ``cusmc_tpu.parallel.resampling``) are called ONCE with the resample
    predicate — they keep collectives unconditional (shard_map-safe) and
    gate the local heavy work internally, so skipping costs ~only the
    ring/window traffic. Ops without ``pred`` fall back to
    compute-both-and-select.
    """
    from cusmc_tpu.models.base import normalize_time_hook
    propagate_fn = normalize_time_hook(propagate_fn, "x")
    logpdf_fn = normalize_time_hook(logpdf_fn, "y")

    import inspect

    op_takes_pred = False
    if resample_op is not None and ess_threshold is not None:
        try:
            op_takes_pred = ("pred"
                             in inspect.signature(resample_op).parameters)
        except (TypeError, ValueError):
            op_takes_pred = False

    def step(carry, inp):
        x, logw, key = carry
        t, y_t = inp
        key_t = jax.random.fold_in(key, t)
        k_res, k_prop = jax.random.split(key_t)
        if axis_name is not None:
            k_prop = jax.random.fold_in(k_prop, lax.axis_index(axis_name))

        ess = effective_sample_size(logw, axis_name)

        def do_resample(_):
            return resample_op(k_res, x, logw)

        def skip_resample(_):
            # Identity ancestry in GLOBAL indices (sharded resample ops
            # record global slots; the skip branch must match).
            n_local = logw.shape[0]
            slots = jnp.arange(n_local, dtype=jnp.int32)
            if axis_name is not None:
                slots = slots + lax.axis_index(axis_name) * n_local
            return x, logw, slots

        if ess_threshold is None:
            x_anc, logw_pre, a = do_resample(None)
        elif axis_name is None:
            x_anc, logw_pre, a = lax.cond(
                ess < ess_threshold * num_particles_global,
                do_resample, skip_resample, None)
        elif op_takes_pred:
            # Collective-aware op: one call, local work gated internally.
            pred = ess < ess_threshold * num_particles_global
            x_anc, logw_pre, a = resample_op(k_res, x, logw, pred=pred)
        else:
            # Under shard_map, keep collectives unconditional (cond with
            # collective bodies is fragile); compute both and select.
            rx, rw, ra = do_resample(None)
            sx, sw, sa = skip_resample(None)
            pred = ess < ess_threshold * num_particles_global
            x_anc = jnp.where(pred, rx, sx)
            logw_pre = jnp.where(pred, rw, sw)
            a = jnp.where(pred, ra, sa)

        x_new = propagate_fn(k_prop, x_anc, t)
        ll = logpdf_fn(y_t, x_new, t)

        logw_new, lz_inc = log_normalize(logw_pre + ll, axis_name)
        if debug_checks:
            from cusmc_tpu.utils.debug import assert_finite_weights

            assert_finite_weights(logw_new, t)
        carry = (x_new, logw_new, key)
        history = (x_new, ll, a) if return_history else ()
        return carry, (history, ess, lz_inc)

    return step


def _fast_exp_step_factory(propagate_fn: Callable, logpdf_fn: Callable,
                           n_global: int, resample_exp: Callable,
                           ess_threshold: Optional[float],
                           axis_name: Optional[str],
                           return_history: bool = True):
    """Exp-space scan body — the packed fast path, UNIFIED over
    single-shard vs sharded (psum/pmax replace the local sums) and
    always-resample vs ESS-adaptive. The carry holds max-normalized exp
    weights ``w`` instead of log weights: ESS and the evidence increment
    come from fused sums over ``w``; resamplers consume ``w`` (or its
    unnormalized cumsum) directly, so the per-step softmax/exp passes of
    the generic log-space path disappear. Always-resample single-shard
    traces are identical to the round-3 specialized factories
    (the 1.47 B metropolis headline path).

    ``resample_exp(key, x, w[, pred]) -> (x_anc, w_pre, a)`` with
    ``w_pre`` the post-op weights (ones when resampled, ``w`` when the
    pred-aware op skipped). Evidence algebra (adaptive case):
    lz_inc = log(sum(w_pre * exp(ll))) - log(sum(w_pre)), where the
    denominator is exactly n_global after a resample — identical to the
    generic path's ``log_normalize(logw_pre + ll)`` increment.

    Known representation limit: exp-space weights more than ~88 nats
    below the running max flush to zero (f32 + XLA FTZ) and cannot
    recover on later likelihood spikes. Irrelevant whenever resampling
    actually fires (each fire resets the carry to ones, and a particle
    88 nats down contributes < 1e-38 to every estimate), but in a
    never-resample SIS regime over long horizons the log-space generic
    path (``layout="batch"`` or ``debug_checks=True``) is the exact
    one — measured 0.2 nats divergence after 40 SIS steps on a carry
    whose weight spread had reached e5e5.

    (Measured dead end, kept as a note: applying the winning-roll
    selection to G@X instead of X — mathematically identical since the
    selection commutes with per-column maps — REGRESSED d=2 1.35B ->
    0.90B and d=16 808M -> 559M: XLA fuses the select chain into the
    matmul operand read when the matmul consumes it, which the
    reordering defeats.)"""
    from cusmc_tpu.models.base import normalize_time_hook
    propagate_fn = normalize_time_hook(propagate_fn, "x")
    logpdf_fn = normalize_time_hook(logpdf_fn, "y")

    import inspect

    log_n = math.log(n_global)
    op_takes_pred = False
    if ess_threshold is not None:
        try:
            op_takes_pred = ("pred"
                             in inspect.signature(resample_exp).parameters)
        except (TypeError, ValueError):
            pass

    def psum_(v):
        return lax.psum(v, axis_name) if axis_name is not None else v

    def pmax_(v):
        return lax.pmax(v, axis_name) if axis_name is not None else v

    def step(carry, inp):
        x, w, key = carry
        t, y_t = inp
        key_t = jax.random.fold_in(key, t)
        k_res, k_prop = jax.random.split(key_t)
        if axis_name is not None:
            k_prop = jax.random.fold_in(k_prop, lax.axis_index(axis_name))

        s1 = psum_(jnp.sum(w))
        s2 = psum_(jnp.sum(w * w))
        ess = s1 * s1 / s2

        if ess_threshold is None:
            x_anc, _, a = resample_exp(k_res, x, w)
            x_new = propagate_fn(k_prop, x_anc, t)
            ll = logpdf_fn(y_t, x_new, t)
            m = pmax_(jnp.max(ll))
            w_new = jnp.exp(ll - m)
            lz_inc = m + jnp.log(psum_(jnp.sum(w_new))) - log_n
        else:
            pred = ess < ess_threshold * n_global
            n_local = w.shape[0]

            def skip(_):
                slots = jnp.arange(n_local, dtype=jnp.int32)
                if axis_name is not None:
                    slots = slots + lax.axis_index(axis_name) * n_local
                return x, w, slots

            if op_takes_pred:
                # Collective-aware op: one call, local work gated
                # internally (shard_map-safe).
                x_anc, w_pre, a = resample_exp(k_res, x, w, pred=pred)
            elif axis_name is None:
                x_anc, w_pre, a = lax.cond(
                    pred, lambda _: resample_exp(k_res, x, w), skip, None)
            else:
                rx, rw, ra = resample_exp(k_res, x, w)
                sx, sw, sa = skip(None)
                x_anc = jnp.where(pred, rx, sx)
                w_pre = jnp.where(pred, rw, sw)
                a = jnp.where(pred, ra, sa)
            denom = jnp.where(pred, jnp.asarray(float(n_global), s1.dtype),
                              s1)
            x_new = propagate_fn(k_prop, x_anc, t)
            ll = logpdf_fn(y_t, x_new, t)
            m = pmax_(jnp.max(ll))
            w_new = w_pre * jnp.exp(ll - m)
            lz_inc = m + jnp.log(psum_(jnp.sum(w_new))) - jnp.log(denom)
            # Long skip runs multiply sub-1 factors into the carry;
            # renormalize by the global max so it can't creep toward
            # f32 underflow (everything downstream is scale-invariant).
            w_new = w_new / pmax_(jnp.max(w_new))

        carry = (x_new, w_new, key)
        history = (x_new, ll, a) if return_history else ()
        return carry, (history, ess, lz_inc)

    return step


def packed_exp_resample_op(resampler_name: str, num_particles_global: int,
                           **kwargs) -> Callable:
    """Single-shard exp-space resample op for the fast factory:
    ``(key, X [d, N], w [N]) -> (x_anc, ones, ancestors)``. The CDF
    family consumes the UNNORMALIZED inclusive cumsum (the search is
    scale-invariant; positions scale by the total) so the softmax pass
    disappears; residual reuses the ESS sum via CSE for its N/sum(w)
    scaling."""
    from cusmc_tpu.ops.cumsum import blocked_cumsum
    from cusmc_tpu.ops.monotone_gather import inverse_cdf_apply
    from cusmc_tpu.resampling.classic import POSITION_FNS

    n = num_particles_global
    if resampler_name == "metropolis":
        from cusmc_tpu.resampling.rolls import (
            roll_metropolis_sweeps_expspace,
            roll_metropolis_sweeps_expspace_auto,
        )

        num_steps = kwargs.get("num_steps", 10)
        if num_steps == "auto":
            # ESS-conditioned sweep truncation (opt-in): B, B/2 or B/4
            # sweeps by Kish ESS bucket — see rolls.py for thresholds.
            base = kwargs.get("base_steps", 10)

            def op(key, X, w):
                x_anc, a = roll_metropolis_sweeps_expspace_auto(
                    key, X, w, base)
                return x_anc, jnp.ones_like(w), a

            return op

        def op(key, X, w):
            x_anc, a = roll_metropolis_sweeps_expspace(key, X, w,
                                                       num_steps)
            return x_anc, jnp.ones_like(w), a

        return op
    if resampler_name in POSITION_FNS:
        pos_fn = POSITION_FNS[resampler_name]

        def op(key, X, w):
            cdf, cdf128 = blocked_cumsum(w)
            positions = pos_fn(key, n, w.dtype) * cdf[-1]
            x_anc, a = inverse_cdf_apply(cdf, positions, X, cdf128=cdf128)
            return x_anc, jnp.ones_like(w), a

        return op
    if resampler_name == "residual":

        def op(key, X, w):
            s1 = jnp.sum(w)
            x_anc, a = _residual_resample_packed(key, X, w * (n / s1))
            return x_anc, jnp.ones_like(w), a

        return op
    raise KeyError(f"no exp-space fast op for resampler {resampler_name!r}")


def _fused_cdf_step_factory(model: DLM, num_particles: int, pos_mode: str,
                            tile: Optional[int], sr: int,
                            return_history: bool = True,
                            interpret: bool = False):
    """Exp-space scan body around the fused UNBIASED inverse-CDF kernel
    (ops/fused_cdf_step.py): systematic/stratified resample + propagate
    + reweight in ONE kernel pass. Same carry/ESS/evidence algebra as
    ``_fast_exp_step_factory``; the per-step O(N) work outside the
    kernel is just the blocked cumsum and the weight reductions."""
    from cusmc_tpu.ops.cumsum import blocked_cumsum
    from cusmc_tpu.ops.fused_cdf_step import fused_cdf_filter_step

    log_n = math.log(num_particles)
    k_dim = model.obs_dim
    half_logdet = jnp.sum(jnp.log(jnp.diagonal(model.V_chol)))
    if model.noise == "mvt":
        from jax.scipy.special import gammaln

        df = model.df
        log_norm = (gammaln(0.5 * (df + k_dim)) - gammaln(0.5 * df)
                    - 0.5 * k_dim * (jnp.log(df) + math.log(math.pi))
                    - half_logdet)
    else:
        df = None
        log_norm = -0.5 * k_dim * math.log(2.0 * math.pi) - half_logdet

    def step(carry, inp):
        x, w, key = carry
        t, y_t = inp
        key_t = jax.random.fold_in(key, t)

        s1 = jnp.sum(w)
        s2 = jnp.sum(w * w)
        ess = s1 * s1 / s2

        cdf, cdf128 = blocked_cumsum(w, interpret=interpret)
        x_new, ll, a = fused_cdf_filter_step(
            key_t, cdf, cdf128, x, y_t, model.G, model.W_sqrt, model.F,
            model.V_chol_inv, df, log_norm, noise=model.noise,
            mode=pos_mode, tile=tile, sr=sr, interpret=interpret,
            df_int=model.df_int)
        m = jnp.max(ll)
        w_new = jnp.exp(ll - m)
        lz_inc = m + jnp.log(jnp.sum(w_new)) - log_n

        carry = (x_new, w_new, key)
        history = (x_new, ll, a) if return_history else ()
        return carry, (history, ess, lz_inc)

    return step


def _fused_cdf_eligible(model, n: int) -> bool:
    """Static eligibility for the fused inverse-CDF kernel engine:
    float32 DLM within the MXU dim cap, standard (one-chi-square) MVT
    with concrete df >= 2 (the in-kernel Marsaglia-Tsang fallback has
    no alpha<1 boost), and N big enough for the window walk."""
    from cusmc_tpu.ops.fused_cdf_step import DEFAULT_SROWS, cdf_auto_tile

    if not (isinstance(model, DLM)
            and max(model.state_dim, model.obs_dim) <= MAX_MXU_DIM
            and not model.per_dim_chi
            and model.G.dtype == jnp.float32):
        return False
    tile = cdf_auto_tile(n, max(model.state_dim, model.obs_dim))
    if n % tile != 0 or n < 2 * DEFAULT_SROWS * 128 or n % 128 != 0:
        return False
    if n > 1 << 24:  # kernel guard: f32-exact group positions need n <= 2^24
        return False
    if model.noise == "mvt":
        if isinstance(model.df, jax.core.Tracer):
            return False
        try:
            if float(model.df) < 2.0:
                return False
        except Exception:
            return False
    return True


def _residual_resample_packed(key, X, nw):
    """Residual resampling of packed X [d, n] from PRE-SCALED weights
    ``nw`` [n] (= n * w / sum(w)): two fused inverse-CDF kernel passes
    (deterministic-floor integer grid + residual order statistics) and a
    dynamic roll — replaces the registry path's merge-ranks + random
    gather (6.2 M particle-steps/s in round 2, benchmarks/RESULTS.md).
    Law identical to ``resampling.classic.residual_ancestors``. Returns
    ``(x_anc [d, n], ancestors [n])``."""
    from cusmc_tpu.ops.cumsum import blocked_cumsum
    from cusmc_tpu.ops.monotone_gather import inverse_cdf_apply
    from cusmc_tpu.resampling.classic import _residual_positions

    n = nw.shape[0]
    wdt = nw.dtype
    counts = jnp.floor(nw)
    ccum, c128 = blocked_cumsum(counts)
    n_det = jnp.minimum(ccum[-1], n).astype(jnp.int32)
    rcdf, r128 = blocked_cumsum(jnp.maximum(nw - counts, 0.0))
    slots = jnp.arange(n, dtype=wdt)
    # Positions are clamped INSIDE the cdf range: slots past the
    # det/residual boundary would rank to N, and the straddling
    # output block would walk windows to the array end (the
    # merge-path kernel absorbs any span, but ~N/2048 wasted
    # window loads per step are avoidable). Clamped tail slots
    # land on the last active entry; their outputs are masked
    # off below.
    p_det = jnp.minimum(slots + 0.5, n_det.astype(wdt) - 0.5)
    x_det, a_det = inverse_cdf_apply(ccum, p_det, X, cdf128=c128)
    v = jnp.minimum(_residual_positions(key, n, n_det, wdt),
                    1.0 - 1e-6) * rcdf[-1]
    x_res, a_res = inverse_cdf_apply(rcdf, v, X, cdf128=r128)
    # Align draw k to slot n_det + k: roll right by n_det. A
    # traced-shift jnp.roll lowers to a random gather (~8 ms per
    # [N] array at N=1M on v5e); double-and-slice is two
    # contiguous DMAs.

    def droll(arr, s):
        two = jnp.concatenate([arr, arr], axis=-1)
        return lax.dynamic_slice_in_dim(
            two, arr.shape[-1] - s, arr.shape[-1], axis=-1)

    a_res = droll(a_res, n_det)
    x_res = droll(x_res, n_det)
    mask = slots < n_det
    a = jnp.where(mask, a_det, a_res)
    x_anc = jnp.where(mask[None, :], x_det, x_res)
    return x_anc, a


def local_resample_op(resampler: Callable, num_particles_global: int):
    """Batch-layout resample op from a (key, logw) -> idx resampler."""
    log_n = math.log(num_particles_global)

    def op(key, x, logw):
        a = resampler(key, logw)
        return x[a], jnp.full(logw.shape, -log_n, logw.dtype), a

    return op


def packed_resample_op(resampler_name: str, num_particles_global: int,
                       **kwargs):
    """Packed-layout [d, N] resample op for a registry key.

    "metropolis" -> gather-free roll-Metropolis sweeps;
    CDF family (systematic/stratified/multinomial) -> the fused
    window-walk Pallas kernel ``ops/monotone_gather.inverse_cdf_apply``
    (in-kernel binary search + dynamic_gather apply): no argsort, no
    global searchsorted, no random lane gather — the three ops that
    capped the CDF resamplers at ~95 M particle-steps/s in round 1
    (benchmarks/RESULTS.md);
    "residual" -> ``_residual_resample_packed`` (two fused inverse-CDF
    kernel passes over the floor/remainder decomposition);
    others (custom) -> registry ancestor fn + ``take_columns`` (monotone
    fast path with a jnp.take fallback for unsorted ancestry).
    """
    from cusmc_tpu.ops.monotone_gather import inverse_cdf_apply, take_columns
    from cusmc_tpu.resampling.classic import POSITION_FNS

    log_n = math.log(num_particles_global)

    if resampler_name == "metropolis":
        return roll_metropolis_resample_op(
            num_particles=num_particles_global, **kwargs)

    if resampler_name in POSITION_FNS:
        pos_fn = POSITION_FNS[resampler_name]

        def op(key, X, logw):
            n = logw.shape[0]
            wdt = jnp.promote_types(logw.dtype, jnp.float32)
            from cusmc_tpu.ops.cumsum import blocked_cumsum

            cdf, cdf128 = blocked_cumsum(jax.nn.softmax(logw.astype(wdt)))
            positions = pos_fn(key, n, wdt)
            x_anc, a = inverse_cdf_apply(cdf, positions, X, cdf128=cdf128)
            return x_anc, jnp.full(logw.shape, -log_n, logw.dtype), a

        return op

    if resampler_name == "residual":

        def op(key, X, logw):
            n = logw.shape[0]
            wdt = jnp.promote_types(logw.dtype, jnp.float32)
            nw = n * jax.nn.softmax(logw.astype(wdt))
            x_anc, a = _residual_resample_packed(key, X, nw)
            return x_anc, jnp.full(logw.shape, -log_n, logw.dtype), a

        return op

    ancestor_fn = get_resampler(resampler_name, **kwargs)

    def op(key, X, logw):
        a = ancestor_fn(key, logw)
        return (take_columns(X, a),
                jnp.full(logw.shape, -log_n, logw.dtype), a)

    return op


def _pallas_step_factory(model: DLM, num_particles: int, tile: int,
                         num_sweeps: int, return_history: bool,
                         interpret: bool, num_window_tiles: int = 2):
    """Scan body around the fully fused Pallas step (ops/fused_step.py):
    resample+propagate+reweight in one kernel, plus the O(N) weight
    normalization / ESS reductions outside it."""
    k_dim = model.obs_dim
    half_logdet = jnp.sum(jnp.log(jnp.diagonal(model.V_chol)))
    if model.noise == "mvt":
        from jax.scipy.special import gammaln

        df = model.df
        log_norm = (gammaln(0.5 * (df + k_dim)) - gammaln(0.5 * df)
                    - 0.5 * k_dim * (jnp.log(df) + math.log(math.pi))
                    - half_logdet)
    else:
        df = None
        log_norm = -0.5 * k_dim * math.log(2.0 * math.pi) - half_logdet

    def step(carry, inp):
        x, logw, key = carry
        t, y_t = inp
        key_t = jax.random.fold_in(key, t)
        ess = effective_sample_size(logw)
        x_new, ll, a = fused_filter_step(
            key_t, x, logw, y_t, model.G, model.W_sqrt, model.F,
            model.V_chol_inv, df, log_norm, noise=model.noise,
            num_sweeps=num_sweeps, tile=tile, interpret=interpret,
            df_int=model.df_int, num_window_tiles=num_window_tiles)
        # Always-resample semantics: pre-weights uniform 1/N.
        logw_new, lse = log_normalize(ll)
        lz_inc = lse - math.log(num_particles)
        carry = (x_new, logw_new, key)
        history = (x_new, ll, a) if return_history else ()
        return carry, (history, ess, lz_inc)

    return step


def _pallas_eligible(model, n: int, tile: int) -> bool:
    if not (isinstance(model, DLM)
            and max(model.state_dim, model.obs_dim) <= MAX_MXU_DIM
            and n % tile == 0 and n >= 2 * tile and tile % 128 == 0
            and not model.per_dim_chi
            # The kernel's state window/output follow the model's state
            # dtype: f32, or bf16 under mixed precision (the weight path
            # stays f32 either way; bf16's window rotation runs on the
            # int32 sublane-pair view, so it needs even d).
            and (model.G.dtype == jnp.float32
                 or (model.G.dtype == jnp.bfloat16
                     and model.state_dim % 2 == 0))):
        return False
    if model.noise == "mvt":
        # The in-kernel Marsaglia-Tsang sampler has no alpha<1 boost:
        # require df >= 2 (alpha = df/2 >= 1). Traced df can't be checked
        # here -> not eligible.
        if isinstance(model.df, jax.core.Tracer):
            return False
        try:
            if float(model.df) < 2.0:
                return False
        except Exception:
            return False
    return True


def bootstrap_filter(
    key: jax.Array,
    model: DLM,
    ys: jnp.ndarray,
    num_particles: int,
    resampler: str = "metropolis",
    resampler_kwargs: Optional[dict] = None,
    ess_threshold: Optional[float] = None,
    return_history: bool = True,
    layout: str = "auto",
    engine: str = "auto",
    pallas_tile: Optional[int] = None,
    pallas_interpret: bool = False,
    axis_name: Optional[str] = None,
    num_particles_global: Optional[int] = None,
    resample_op: Optional[Callable] = None,
    resample_op_weights: str = "log",
    debug_checks: bool = False,
) -> FilterResult:
    """Run the bootstrap filter on observations ``ys`` [T, k].

    Row 0 of ``ys`` is ignored (t=0 is the prior draw — the bundled dataset's
    first observation row is zeros, ``data_raw/y_t.csv``; the reference loop
    starts at t=1, ``src/mcmc.cpp:292``).

    ``resampler`` is a registry key ("metropolis" | "systematic" |
    "stratified" | "multinomial"); ``resample_op`` overrides the whole
    resampling operation with a custom ``(key, x, logw) -> (x_anc, logw, a)``
    matching the chosen layout (used by the sharded path to inject a
    collective-aware resampler); with ``resample_op_weights="exp"`` the
    injected op instead consumes/returns max-normalized exp weights and
    the scan carries them (the sharded fast path — packed layout only).
    ``ess_threshold=None`` -> resample every step (reference behavior);
    a float in (0, 1] -> adaptive on Kish ESS.

    ``layout``: "auto" (packed unless a custom batch-layout resample_op is
    injected), "packed", or "batch". Results are layout-independent in
    distribution; RNG streams differ, so exact values are layout-specific.

    Under ``shard_map`` pass ``axis_name`` (the particle mesh axis) and the
    global N via ``num_particles_global``; ``num_particles`` is then local.
    """
    from cusmc_tpu.models.base import supports_packed

    resampler_kwargs = resampler_kwargs or {}
    n_global = num_particles_global or num_particles
    if layout == "auto":
        if resample_op is not None or not supports_packed(model):
            layout = "batch"
        else:
            layout = "packed"
    if layout not in ("packed", "batch"):
        raise ValueError(f"unknown layout {layout!r}")
    if layout == "packed" and not supports_packed(model):
        raise ValueError("model has no packed-layout methods; use "
                         "layout='batch'")
    packed = layout == "packed"

    # Engine choice (measured on v5e, f32, N=1M, T=200, B=10 —
    # benchmarks/RESULTS.md): the XLA packed path wins at small d (d=2
    # 1.44B vs 880M; d=16 857M vs 643M) where its fused select-chain
    # traffic is cheap; the fused Pallas kernel (ops/fused_step.py) wins
    # at d >= 32 f32 (d=32 396M vs 317M, d=64 230M vs 168M, d=128 115M
    # vs 87M) and d >= 64 bf16, where reading X once per step beats
    # XLA's (B+1)-way select over [d, N]. The kernel stays OPT-IN (see
    # the engine="auto" note below).
    user_tile = pallas_tile  # None -> per-kernel auto (the two Pallas
    # engines have different VMEM/live-set shapes, hence different autos)
    if pallas_tile is None:
        from cusmc_tpu.ops.fused_step import auto_tile

        dk = (max(model.state_dim, model.obs_dim)
              if isinstance(model, DLM) else 1)
        itemsize = (jnp.dtype(model.G.dtype).itemsize
                    if isinstance(model, DLM) else 4)
        pallas_tile = auto_tile(num_particles, dk, itemsize)
    # The fused-CDF kernel engine (ops/fused_cdf_step.py) is UNBIASED
    # (exact inverse-CDF positions), so unlike the windowed-Metropolis
    # kernel it WOULD be eligible for auto-selection wherever it
    # measured faster than the XLA path — but the round-4 d-sweep found
    # no such d (0.80-0.92x of the composed cumsum-kernel -> search-
    # kernel -> XLA-epilogue pipeline at every d in 2..128; full
    # per-stage analysis in benchmarks/RESULTS.md "fused UNBIASED
    # inverse-CDF engine"). auto therefore never selects it;
    # engine="pallas" is the explicit, on-chip-validated opt-in.
    fused_cdf_ok = (packed and resampler in ("systematic", "stratified")
                    and ess_threshold is None and axis_name is None
                    and resample_op is None and not debug_checks
                    and (pallas_interpret
                         or jax.default_backend() == "tpu")
                    and _fused_cdf_eligible(model, num_particles))
    use_fused_cdf = False
    if engine == "pallas" and resampler in ("systematic", "stratified"):
        if not fused_cdf_ok:
            raise ValueError(
                "engine='pallas' with a CDF resampler needs packed "
                "layout, no ESS threshold, a single shard, and a "
                f"float32 DLM with d,k <= {MAX_MXU_DIM} (standard MVT "
                f"df >= 2), N compatible with the window walk")
        use_fused_cdf = True
    if engine == "auto":
        # For metropolis, the windowed-Megopolis kernel is FASTER than
        # the XLA path at d>=32 f32 / d>=64 bf16 (RESULTS.md d-sweep),
        # but its windowed proposal mixes over a 2-tile window per step
        # instead of globally: at equal B its finite-sweep resampling
        # bias is STRICTLY WORSE than the XLA roll scheme's, and the
        # gap widens exactly in the sharp-weight regimes that high-d
        # configs produce (measured d=32 N=262k B=10: logZ -3455
        # windowed vs -2616 roll vs -2097 roll B=30). Silently trading
        # statistical quality for speed is the wrong default, so "auto"
        # always takes the XLA path for metropolis; engine="pallas" is
        # the documented opt-in for throughput-bound workloads.
        engine = "xla"
    if engine == "pallas" and not use_fused_cdf:
        if not (packed and resampler == "metropolis"
                and ess_threshold is None and axis_name is None):
            raise ValueError("engine='pallas' requires packed layout, "
                             "a metropolis/systematic/stratified "
                             "resampler, no ESS threshold, and a single "
                             "shard")
        if not _pallas_eligible(model, num_particles, pallas_tile):
            raise ValueError(
                f"pallas engine needs a DLM with d,k <= {MAX_MXU_DIM}, "
                f"N a multiple of tile={pallas_tile} (and >= 2 tiles), tile "
                f"a multiple of 128, standard MVT with concrete df >= 2, "
                f"and a float32 or bfloat16 state")

    # Exp-space fast paths (packed): carry max-normalized exp weights
    # through the scan (see _fast_exp_step_factory). Round 4 lifted the
    # round-3 single-shard/always-resample restrictions: ESS-adaptive
    # configs gate the resample via cond/pred on the carried sums, and
    # sharded configs inject collective exp ops (parallel/resampling.py
    # weights="exp") via resample_op_weights="exp".
    from cusmc_tpu.resampling.classic import POSITION_FNS

    exp_op = None
    if resample_op is not None and resample_op_weights == "exp":
        if not packed or engine != "xla" or debug_checks:
            raise ValueError(
                "resample_op_weights='exp' needs packed layout, "
                "engine in ('auto', 'xla'), and debug_checks=False")
        exp_op = resample_op
    elif (engine == "xla" and packed and not debug_checks
          and not use_fused_cdf and resample_op is None
          and axis_name is None
          and (resampler in ("metropolis", "residual")
               or resampler in POSITION_FNS)):
        exp_op = packed_exp_resample_op(resampler, n_global,
                                        **resampler_kwargs)
    fast_exp = use_fused_cdf or exp_op is not None

    if (engine != "pallas" and not fast_exp and resample_op is None):
        if packed:
            resample_op = packed_resample_op(resampler, n_global,
                                             **resampler_kwargs)
        else:
            res_fn = get_resampler(resampler, **resampler_kwargs)
            resample_op = local_resample_op(res_fn, n_global)

    k_init, k_scan = jax.random.split(key)
    if axis_name is not None:
        k_init = jax.random.fold_in(k_init, lax.axis_index(axis_name))
    if packed:
        x0 = model.sample_initial_packed(k_init, num_particles)
        propagate_fn = model.propagate_packed
        logpdf_fn = model.observation_logpdf_packed
    else:
        x0 = model.sample_initial(k_init, (num_particles,))
        propagate_fn = model.propagate
        logpdf_fn = model.observation_logpdf
    # Weights always live in at least float32 — under the mixed-precision
    # state_dtype=bfloat16 mode the state is bf16 but the weight path is not.
    logw0 = jnp.full((num_particles,), -math.log(n_global),
                     jnp.promote_types(x0.dtype, jnp.float32))

    num_steps = ys.shape[0]
    ts = jnp.arange(1, num_steps)
    if use_fused_cdf:
        from cusmc_tpu.ops.fused_cdf_step import DEFAULT_SROWS

        step = _fused_cdf_step_factory(
            model, num_particles, resampler, user_tile,
            resampler_kwargs.get("sr", DEFAULT_SROWS), return_history,
            pallas_interpret)
    elif engine == "pallas":
        num_sweeps = resampler_kwargs.get("num_steps", 10)
        step = _pallas_step_factory(
            model, num_particles, pallas_tile, num_sweeps, return_history,
            pallas_interpret,
            resampler_kwargs.get("num_window_tiles", 2))
    elif exp_op is not None:
        step = _fast_exp_step_factory(
            propagate_fn, logpdf_fn, n_global, exp_op, ess_threshold,
            axis_name, return_history)
    else:
        step = _step_factory(propagate_fn, logpdf_fn, resample_op,
                             ess_threshold, n_global, axis_name,
                             return_history, debug_checks)
    if fast_exp:
        w0 = jnp.exp(logw0 - jnp.max(logw0))  # uniform -> ones
        (x_f, w_f, _), (history, esss, lzs) = lax.scan(
            step, (x0, w0, k_scan), (ts, ys[1:]))
        sw_f = jnp.sum(w_f)
        if axis_name is not None:
            sw_f = lax.psum(sw_f, axis_name)
        logw_f = jnp.log(w_f) - jnp.log(sw_f)
    else:
        (x_f, logw_f, _), (history, esss, lzs) = lax.scan(
            step, (x0, logw0, k_scan), (ts, ys[1:]))

    ess0 = effective_sample_size(logw0, axis_name)
    ess = jnp.concatenate([ess0[None], esss])
    log_evidence = jnp.sum(lzs)

    if packed:
        x_f = x_f.T
    if not return_history:
        return FilterResult(
            final_particles=x_f, final_log_weights=logw_f,
            ess=ess, log_evidence=log_evidence)

    xs, lls, ancs = history
    x0_out = x0.T if packed else x0
    if packed:
        xs = jnp.swapaxes(xs, 1, 2)  # [T-1, d, N] -> [T-1, N, d]
    particles = jnp.concatenate([x0_out[None], xs], axis=0)
    # t=0 raw weight is the uniform 1/N fill (reference mcmc.cpp:85).
    obs_loglik = jnp.concatenate([logw0[None], lls], axis=0)
    a0 = jnp.arange(num_particles, dtype=jnp.int32)
    if axis_name is not None:  # global slots, matching sharded resample ops
        a0 = a0 + lax.axis_index(axis_name) * num_particles
    ancestors = jnp.concatenate([a0[None], ancs], axis=0)
    return FilterResult(
        final_particles=x_f, final_log_weights=logw_f,
        ess=ess, log_evidence=log_evidence,
        particles=particles, obs_loglik=obs_loglik, ancestors=ancestors)
