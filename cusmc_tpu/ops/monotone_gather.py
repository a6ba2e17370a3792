"""Monotone-ancestor apply kernels: the fast path for CDF resamplers.

The CDF resampler family (systematic / stratified / multinomial) produces
ancestor indices that are monotone non-decreasing in the output slot. A
random [d, N] lane gather (``jnp.take``) ignores that structure and costs
~3.8 ms at N=1M on v5e (index-bound, not bandwidth-bound); the round-1
merge-rank ancestor computation added two ~2 ms argsorts on top, capping
the CDF resamplers at ~95 M particle-steps/s vs the 1.35 B Metropolis
headline (benchmarks/RESULTS.md).

Monotonicity means output block b reads a CONTIGUOUS input window of the
global arrays. Both kernels here walk those windows with double-buffered
async DMAs; the within-window work uses Mosaic's ``tpu.dynamic_gather``,
which is restricted to a single vreg along the gather axis (128 lanes /
8 sublanes, measured on v5e: multi-vreg sources fail to lower). The
window is therefore held as ONE f32 vreg — an [8, 128] fold of 1024
consecutive elements — and an arbitrary in-window lookup at index w is a
two-gather composition (valid because both index vectors are uniform
along the non-gathered axis):

    h[i, j] = win[i, (w_j & 127)]   (lane gather,   axis=1)
    v[i, j] = h[(w_j >> 7), j]      (sublane gather, axis=0)
    => v[., j] = win_flat[w_j]

- ``take_columns(X, a)`` — apply a given sorted ancestor vector.
- ``inverse_cdf_apply(cdf, positions, X)`` — the fully fused resampler:
  ancestors are computed IN the kernel, then applied. Replaces
  cumsum+merge-rank+gather: no argsort, no global searchsorted, one
  pass over HBM.

The search kernel (round 3, merge-path rewrite) holds a 2048-element
window as a [16, 128] row-major fold and walks A DATA-DEPENDENT NUMBER
of windows per output block (``lax.fori_loop`` over per-block window
counts prefetched as scalars): block b's sorted queries span cdf rows
[r128[b], r128[b+1]], and the kernel loads ceil(span/16) consecutive
windows, double-buffered across the loop AND across grid blocks. This
makes the kernel SPAN-PROOF: concentrated weights (long runs of
zero-weight entries between block boundaries, e.g. the residual
resampler's floor-count cdf, where measured spans hit 796 rows vs the
old fixed 16-row window) cost extra window iterations instead of
falling back to the XLA merge-rank + random-gather path (~8 ms at
N=1M — benchmarks/probe_residual.py). Total DMA traffic stays O(N):
the windows tile the global cdf once plus one overlap per block.

Per window, a TWO-PHASE rank resolves each query vreg (8 sorted query
rows at once):

  phase A (row): one lane-gather materializes every row's max
  broadcast across lanes; the count c of window rows <= p places the
  query's boundary row — c == 16 means "not in this window yet"
  (16 compares, no gathers), and the per-query result row is
  accumulated as window_base + c.
  phase B (lane): 7-round bitwise search WITHIN the boundary row,
  run only on windows where some query resolves (``pl.when`` skip);
  each round's lookup is a select-chain over the 16 row-broadcast
  vregs (per-sublane-varying lane indices are legal for
  ``dynamic_gather``).

The coarse per-block window placement comes from a rank-by-merge over
the 128-STRIDED cdf (n/128 elements), not the full cdf — measured
0.79 ms -> ~0.05 ms at N=1M on v5e (benchmarks/probe_cdf_kernel.py).

``take_columns`` falls back to the XLA gather path (identical
semantics) when the backend is not TPU or shapes are ineligible, and
— decided at RUNTIME via ``lax.cond`` — when the ancestors are not
monotone non-decreasing or out of range. ANY ancestor span runs
in-kernel (both kernels walk a dynamic number of windows per block).
``inverse_cdf_apply`` needs no runtime fallback at all; only
backend/shape/dtype ineligibility routes to the XLA path.

Replaces the role of the reference's host-side ancestor gather + H2D
round-trip (``/root/reference/src/mvn_dist.cu.cpp:194-205``) for the
low-variance resampler family (north-star extension, BASELINE.md).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FOLD = 128                 # lanes per fold row
WROWS = 8                  # take_columns: fold rows per window (one vreg)
WINDOW = FOLD * WROWS      # take_columns: 1024-element window per block
DEFAULT_TILE = 512         # take_columns: output elements per grid block
SROWS = 16                 # search kernel: fold rows per window
SWINDOW = FOLD * SROWS     # search kernel: 2048-element window
SEARCH_TILE = 1024         # search kernel: output elements per grid block


def _use_pallas(d: int, n: int, tile: int, dtype, interpret: bool,
                *, tile_max: int = WINDOW, window: int = WINDOW) -> bool:
    shapes_ok = (n % tile == 0
                 and tile % FOLD == 0
                 and tile <= tile_max
                 and n >= window
                 and dtype == jnp.float32)
    return shapes_ok and (interpret or jax.default_backend() == "tpu")


def _lookup(table, w_idx):
    """Window lookup: table [8, 128] (fold of 1024 values), w_idx [1, 128]
    int32 in [0, 1024) -> [1, 128] with out[0, j] = flat(table)[w_idx_j]."""
    l = jnp.broadcast_to(w_idx & (FOLD - 1), (WROWS, FOLD))
    s = jnp.broadcast_to(w_idx >> 7, (WROWS, FOLD))
    h = jnp.take_along_axis(table, l, axis=1)
    return jnp.take_along_axis(h, s, axis=0)[0:1, :]


def _phase_b(cw, masks, p):
    """In-row bitwise rank: log2(FOLD) rounds WITHIN each query's
    boundary row. ``cw`` [srows, FOLD] window fold (row count taken from
    the shape), ``masks`` the boundary-row one-hots for rows 1..srows-1
    (row 0 is the default), ``p`` [h, FOLD] queries. Each round's lookup
    is a select-chain over the row-broadcast vregs (dynamic_gather
    accepts per-sublane-varying lane indices; the masks are
    loop-invariant and hoisted). Returns ``rlow`` [h, FOLD] =
    #{lane l in boundary row: cw[row, l] <= p}."""
    h = p.shape[0]
    srows = cw.shape[0]
    rows = [jnp.broadcast_to(cw[r:r + 1, :], (h, FOLD))
            for r in range(srows)]
    rlow = jnp.zeros((h, FOLD), jnp.int32)
    k = FOLD
    while k > 1:
        k //= 2
        gi = rlow + (k - 1)
        v = jnp.take_along_axis(rows[0], gi, axis=1)
        for r in range(1, srows):
            v = jnp.where(masks[r - 1],
                          jnp.take_along_axis(rows[r], gi, axis=1), v)
        rlow = jnp.where(v <= p, rlow + k, rlow)
    return rlow


def _phase_b_fast(cw, c_eff, active, p):
    """Two-table in-row bisection — a MEASURED NEGATIVE result kept for
    the record (round 5; reachable via ``_ablate="fastb"`` and
    benchmarks/probe_phaseb.py; full analysis in RESULTS.md "phase-B
    formulations").

    Idea: queries of one fold SUBLANE are 128 consecutive sorted
    positions, so their boundary rows almost always span <= 2 window
    rows; materialize each sublane's first boundary row (M) and its
    successor (M2) once via a select-chain keyed on the per-sublane
    scalar row r0, making every bisection probe two lane-gathers + one
    select instead of a 16-row select chain. Exact: returns
    (rlow, bad) where ``bad`` marks active queries whose row escapes
    {r0, r0+1}; the caller re-resolves those with the exact chain.

    On-chip, in the composed filter, this measured ~13% SLOWER than
    the plain chain (systematic 480 vs ~555 Mps tunnel-adjusted): the
    per-window table build + min-reduce + the data-dependent
    ``pl.when(any(bad))`` fallback cost more than the probe savings —
    Mosaic hoists the plain chain's loop-invariant masks, so its
    effective per-probe cost is far below its op count.
    """
    h = p.shape[0]
    srows = cw.shape[0]
    c_act = jnp.where(active, c_eff, srows)
    r0v = jnp.min(c_act, axis=1, keepdims=True)            # [h, 1]
    sel_hi = c_eff != r0v                                  # row r0+1
    bad = active & (c_eff > r0v + 1)
    M = jnp.broadcast_to(cw[0:1, :], (h, FOLD))
    M2 = jnp.broadcast_to(cw[min(1, srows - 1):
                             min(1, srows - 1) + 1, :], (h, FOLD))
    for r in range(1, srows):
        m_r = r0v == r
        M = jnp.where(m_r, jnp.broadcast_to(cw[r:r + 1, :],
                                            (h, FOLD)), M)
        r2 = min(r + 1, srows - 1)
        M2 = jnp.where(m_r, jnp.broadcast_to(cw[r2:r2 + 1, :],
                                             (h, FOLD)), M2)
    rlow = jnp.zeros((h, FOLD), jnp.int32)
    k = FOLD
    while k > 1:
        k //= 2
        gi = rlow + (k - 1)
        v = jnp.where(sel_hi,
                      jnp.take_along_axis(M2, gi, axis=1),
                      jnp.take_along_axis(M, gi, axis=1))
        rlow = jnp.where(v <= p, rlow + k, rlow)
    return rlow, bad


def _select_rows(xw_r, masks, rlow):
    """Apply lookup at (boundary row, rlow) via the same masks: xw_r
    [srows, FOLD] one state dimension's window fold -> [h, FOLD]."""
    h = rlow.shape[0]
    srows = xw_r.shape[0]
    v = jnp.take_along_axis(
        jnp.broadcast_to(xw_r[0:1, :], (h, FOLD)), rlow, axis=1)
    for r in range(1, srows):
        v = jnp.where(masks[r - 1], jnp.take_along_axis(
            jnp.broadcast_to(xw_r[r:r + 1, :], (h, FOLD)), rlow, axis=1), v)
    return v


def _take_kernel(srows_ref, wcnt_ref, woff_ref, a_ref, x_ref, y_ref,
                 xwin, found, sems, *, nb, qrows, d, n):
    """Merge-path apply for SORTED ancestors: block b walks ``wcnt[b]``
    consecutive 1024-element windows (dynamic fori_loop, double-buffered
    across the loop and across grid blocks via the ``woff`` parity),
    resolving each query in the window containing its ancestor — so any
    ancestor distribution (including the long constant runs concentrated
    weights produce) runs in-kernel instead of falling back to the ~8 ms
    random [d, N] gather."""
    b = pl.program_id(0)
    nrows = n // FOLD

    def rows0(blk, w):
        return jnp.minimum(srows_ref[blk] + w * WROWS, nrows - WROWS)

    def start(slot, blk, w):
        pltpu.make_async_copy(
            x_ref.at[:, pl.ds(rows0(blk, w), WROWS), :],
            xwin.at[slot], sems.at[slot]).start()

    def wait(slot, blk, w):
        pltpu.make_async_copy(
            x_ref.at[:, pl.ds(rows0(blk, w), WROWS), :],
            xwin.at[slot], sems.at[slot]).wait()

    w_n = wcnt_ref[b]
    base = woff_ref[b]
    two = jnp.int32(2)

    @pl.when(b == 0)
    def _():
        start(0, 0, 0)

    found[...] = jnp.zeros((qrows, FOLD), jnp.int32)

    def body(w, _):
        slot = lax.rem(base + w, two)
        nxt = lax.rem(base + w + 1, two)
        last = w + 1 >= w_n

        @pl.when(jnp.logical_not(last))
        def _():
            start(nxt, b, w + 1)

        @pl.when(last & (b + 1 < nb))
        def _():
            start(nxt, b + 1, 0)

        wait(slot, b, w)
        r0 = rows0(b, w)
        for qr in range(qrows):
            rel = a_ref[0, qr:qr + 1, :] - r0 * FOLD
            # Sorted ancestors: anything before this window was already
            # resolved (found); rel >= 0 guards the clamped repeated
            # windows at the array end.
            active = ((found[qr:qr + 1, :] == 0)
                      & (rel >= 0) & (rel < WINDOW))

            @pl.when(jnp.any(active))
            def _(qr=qr, rel=rel, active=active, slot=slot):
                relc = jnp.clip(rel, 0, WINDOW - 1)
                for ri in range(d):
                    v = _lookup(xwin[slot, ri], relc)
                    y_ref[ri, 0, qr:qr + 1, :] = jnp.where(
                        active, v, y_ref[ri, 0, qr:qr + 1, :])
                found[qr:qr + 1, :] = jnp.where(
                    active, 1, found[qr:qr + 1, :])

        return 0

    lax.fori_loop(0, w_n, body, 0)


def _search_kernel(brow_ref, srows_ref, wcnt_ref, woff_ref, pos_ref,
                   cdf_ref, x_ref, y_ref, anc_ref, cwin, xwin, found,
                   rb, sems, *, nb, qrows, d, n, local=False,
                   ablate=None):
    """Merge-path window walk: block b resolves its sorted queries over
    ``wcnt[b]`` consecutive 2048-element windows starting at row
    ``srows[b]``; ``woff[b]`` (cumulative window count) keeps the
    double-buffer slot parity consistent across the dynamic per-block
    loop AND across grid blocks (the last window of block b prefetches
    block b+1's first window).

    ``brow_ref[0]`` is the fold row of ``x_ref``'s first column in the
    GLOBAL index space (0 when x covers the whole cdf): the sharded ring
    exchange searches the gathered global cdf but holds only its LOCAL
    [d, L] state block, so x windows load at ``r0 - brow`` (clamped into
    the local rows) and value writes are additionally masked by whether
    the resolved ancestor actually lies in the loaded local window —
    out-of-block slots keep their previous y values and are filled by
    later ring rounds. ``lrows`` (x_ref's row count) may be < n/128."""
    b = pl.program_id(0)
    nrows = n // FOLD
    lrows = x_ref.shape[1]
    brow = brow_ref[0]

    def rows0(blk, w):
        # Clamp so the 16-row window stays in bounds; repeated clamped
        # windows near the array end re-resolve nothing (found-mask).
        return jnp.minimum(srows_ref[blk] + w * SROWS, nrows - SROWS)

    def xrows0(blk, w):
        return jnp.clip(rows0(blk, w) - brow, 0, lrows - SROWS)

    def start(slot, blk, w):
        r0 = rows0(blk, w)
        pltpu.make_async_copy(
            cdf_ref.at[pl.ds(r0, SROWS), :],
            cwin.at[slot], sems.at[0, slot]).start()
        pltpu.make_async_copy(
            x_ref.at[:, pl.ds(xrows0(blk, w), SROWS), :],
            xwin.at[slot], sems.at[1, slot]).start()

    def wait(slot, blk, w):
        r0 = rows0(blk, w)
        pltpu.make_async_copy(
            cdf_ref.at[pl.ds(r0, SROWS), :],
            cwin.at[slot], sems.at[0, slot]).wait()
        pltpu.make_async_copy(
            x_ref.at[:, pl.ds(xrows0(blk, w), SROWS), :],
            xwin.at[slot], sems.at[1, slot]).wait()

    w_n = wcnt_ref[b]
    base = woff_ref[b]
    two = jnp.int32(2)

    @pl.when(b == 0)
    def _():
        start(0, 0, 0)

    found[...] = jnp.zeros((qrows, FOLD), jnp.int32)

    def body(w, _):
        slot = lax.rem(base + w, two)
        nxt = lax.rem(base + w + 1, two)
        last = w + 1 >= w_n

        @pl.when(jnp.logical_not(last))
        def _():
            start(nxt, b, w + 1)

        @pl.when(last & (b + 1 < nb))
        def _():
            start(nxt, b + 1, 0)

        wait(slot, b, w)
        r0 = rows0(b, w)
        # Local-window row delta: ancestor row (r0 + c_eff) sits at
        # xwin row (c_eff + delta); 0 in the global (brow=0) case.
        delta = r0 - brow - xrows0(b, w)
        cw = cwin[slot]
        # Row maxima broadcast across lanes (one const-index gather).
        rm = jnp.take_along_axis(
            cw, jnp.full((SROWS, FOLD), FOLD - 1, jnp.int32), axis=1)
        for g in range(0, qrows, 8):
            h = min(8, qrows - g)
            p = pos_ref[0, g:g + h, :]
            # Phase A: c = #{window rows fully <= p}. c == SROWS means
            # the boundary row is in a later window — except on the
            # last window, where the query's rank is past the cdf end
            # and clips to the final element (rank semantics: the
            # caller clips anc to n-1 anyway).
            c = jnp.zeros((h, FOLD), jnp.int32)
            for r in range(SROWS):
                c = c + (rm[r:r + 1, :] <= p).astype(jnp.int32)
            active = (found[g:g + h, :] == 0) & ((c < SROWS) | last)

            @pl.when(jnp.any(active))
            def _(p=p, c=c, active=active, g=g, h=h, slot=slot, r0=r0,
                  cw=cw, delta=delta):
                c_eff = jnp.minimum(c, SROWS - 1)
                masks = [(c_eff == r) & active for r in range(1, SROWS)]
                if ablate == "b":
                    # Measurement-only (benchmarks/probe_phaseb.py):
                    # skip the in-row bisection to bound what ANY
                    # cheaper lane-rank scheme could save. WRONG lane.
                    rlow = jnp.zeros((h, FOLD), jnp.int32)
                elif ablate == "fastb":
                    # Measurement-only: the round-5 two-table bisection
                    # (measured a NET LOSS in the composed filter —
                    # RESULTS.md "phase-B formulations").
                    rlow_f, bad = _phase_b_fast(cw, c_eff, active, p)
                    rb[0:h, :] = rlow_f

                    @pl.when(jnp.any(bad))
                    def _(bad=bad, cw=cw, masks=masks, p=p, h=h):
                        rb[0:h, :] = jnp.where(bad,
                                               _phase_b(cw, masks, p),
                                               rb[0:h, :])

                    rlow = rb[0:h, :]
                else:
                    rlow = _phase_b(cw, masks, p)
                anc = jnp.minimum((r0 + c_eff) * FOLD + rlow, n - 1)
                anc_ref[0, g:g + h, :] = jnp.where(
                    active, anc, anc_ref[0, g:g + h, :])
                if local:
                    c_loc = c_eff + delta
                    hit = active & (c_loc >= 0) & (c_loc < SROWS)
                    c_loc = jnp.clip(c_loc, 0, SROWS - 1)
                    vmasks = [(c_loc == r) & hit
                              for r in range(1, SROWS)]
                else:  # delta == 0: the x window tracks the cdf window
                    hit, vmasks = active, masks
                if ablate != "sel":  # "sel": probe-only, skip apply
                    for ri in range(d):
                        v = _select_rows(xwin[slot, ri], vmasks, rlow)
                        y_ref[ri, 0, g:g + h, :] = jnp.where(
                            hit, v, y_ref[ri, 0, g:g + h, :])
                found[g:g + h, :] = jnp.where(
                    active, 1, found[g:g + h, :])

        return 0

    lax.fori_loop(0, w_n, body, 0)


def _search_only_kernel(srows_ref, wcnt_ref, woff_ref, pos_ref, cdf_ref,
                        anc_ref, cwin, found, sems, *, nb, qrows, n):
    """Ancestors-only merge-path walk: ``_search_kernel`` minus the state
    windows/apply — the sharded weight pipeline computes ancestors from
    the all-gathered weights but applies them via the ring exchange's
    local ``take_columns`` mining (parallel/resampling.py), so the [N]
    query search must not pay for a state it doesn't have."""
    b = pl.program_id(0)
    nrows = n // FOLD

    def rows0(blk, w):
        return jnp.minimum(srows_ref[blk] + w * SROWS, nrows - SROWS)

    def start(slot, blk, w):
        pltpu.make_async_copy(
            cdf_ref.at[pl.ds(rows0(blk, w), SROWS), :],
            cwin.at[slot], sems.at[slot]).start()

    def wait(slot, blk, w):
        pltpu.make_async_copy(
            cdf_ref.at[pl.ds(rows0(blk, w), SROWS), :],
            cwin.at[slot], sems.at[slot]).wait()

    w_n = wcnt_ref[b]
    base = woff_ref[b]
    two = jnp.int32(2)

    @pl.when(b == 0)
    def _():
        start(0, 0, 0)

    found[...] = jnp.zeros((qrows, FOLD), jnp.int32)

    def body(w, _):
        slot = lax.rem(base + w, two)
        nxt = lax.rem(base + w + 1, two)
        last = w + 1 >= w_n

        @pl.when(jnp.logical_not(last))
        def _():
            start(nxt, b, w + 1)

        @pl.when(last & (b + 1 < nb))
        def _():
            start(nxt, b + 1, 0)

        wait(slot, b, w)
        r0 = rows0(b, w)
        cw = cwin[slot]
        rm = jnp.take_along_axis(
            cw, jnp.full((SROWS, FOLD), FOLD - 1, jnp.int32), axis=1)
        for g in range(0, qrows, 8):
            h = min(8, qrows - g)
            p = pos_ref[0, g:g + h, :]
            c = jnp.zeros((h, FOLD), jnp.int32)
            for r in range(SROWS):
                c = c + (rm[r:r + 1, :] <= p).astype(jnp.int32)
            active = (found[g:g + h, :] == 0) & ((c < SROWS) | last)

            @pl.when(jnp.any(active))
            def _(p=p, c=c, active=active, g=g, h=h, r0=r0, cw=cw):
                c_eff = jnp.minimum(c, SROWS - 1)
                masks = [(c_eff == r) & active for r in range(1, SROWS)]
                rlow = _phase_b(cw, masks, p)
                anc = jnp.minimum((r0 + c_eff) * FOLD + rlow, n - 1)
                anc_ref[0, g:g + h, :] = jnp.where(
                    active, anc, anc_ref[0, g:g + h, :])
                found[g:g + h, :] = jnp.where(
                    active, 1, found[g:g + h, :])

        return 0

    lax.fori_loop(0, w_n, body, 0)


def inverse_cdf_search(cdf: jnp.ndarray, positions: jnp.ndarray, *,
                       cdf128: jnp.ndarray = None, tile: int = SEARCH_TILE,
                       interpret: bool = False) -> jnp.ndarray:
    """Ancestors a[i] = #{j: cdf[j] <= positions[i]} (clipped to N-1) for
    SORTED positions [L] over the inclusive cumsum ``cdf`` [N] — the
    in-kernel half of ``inverse_cdf_apply`` without a state to gather.
    L need not equal N (the sharded path searches n_local queries over
    the gathered global cdf). Falls back to the XLA merge-rank off-TPU
    or for ineligible shapes."""
    n = cdf.shape[0]
    nq = positions.shape[0]
    eligible = (nq % tile == 0 and tile % FOLD == 0
                and tile <= SWINDOW // 2 and n >= SWINDOW
                and n % FOLD == 0 and cdf.dtype == jnp.float32
                and (interpret or jax.default_backend() == "tpu"))
    if not eligible:
        return _merge_rank_ancestors(cdf, positions)

    nb = nq // tile
    qrows = tile // FOLD
    nrows = n // FOLD
    if cdf128 is None:
        cdf128 = cdf[FOLD - 1::FOLD]
    m = cdf128.shape[0]
    q = jnp.concatenate([positions[::tile], positions[-1:]])
    merged = jnp.concatenate([cdf128, q.astype(cdf128.dtype)])
    rank = jnp.argsort(jnp.argsort(merged))
    r128 = (rank[m:] - jnp.arange(nb + 1)).astype(jnp.int32)
    srows = jnp.minimum(r128[:-1], nrows - SROWS)
    span = jnp.maximum(jnp.minimum(r128[1:], nrows - 1) - srows, 0)
    wcnt = span // SROWS + 1
    woff = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(wcnt)[:-1].astype(jnp.int32)])

    cf = cdf.reshape(nrows, FOLD)
    pf = positions.reshape(nb, qrows, FOLD)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, qrows, FOLD), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, qrows, FOLD), lambda b, *_: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, SROWS, FOLD), cdf.dtype),
            pltpu.VMEM((qrows, FOLD), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    def build_and_call():
        call = pl.pallas_call(
            functools.partial(_search_only_kernel, nb=nb, qrows=qrows,
                              n=n),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nb, qrows, FOLD), jnp.int32),
        )
        return call(srows, wcnt, woff, pf, cf).reshape(nq)

    if interpret:
        with pltpu.force_tpu_interpret_mode():
            return build_and_call()
    return build_and_call()


def _merge_rank_ancestors(cdf: jnp.ndarray, positions: jnp.ndarray
                          ) -> jnp.ndarray:
    """XLA fallback: rank-by-merge inverse CDF (two argsorts; see
    resampling/classic.py for the derivation)."""
    n = cdf.shape[0]
    merged = jnp.concatenate([cdf, positions.astype(cdf.dtype)])
    order = jnp.argsort(merged)
    rank = jnp.argsort(order)
    a = rank[n:] - jnp.arange(positions.shape[0])
    return jnp.clip(a, 0, n - 1).astype(jnp.int32)


def take_columns(X: jnp.ndarray, a: jnp.ndarray, *,
                 tile: int = DEFAULT_TILE,
                 interpret: bool = False) -> jnp.ndarray:
    """``X[:, a]`` for X [d, N] and int32 ancestors a [N].

    Fast path requires ``a`` monotone non-decreasing and in-range —
    verified at runtime (one elementwise pass); violations fall back to
    ``jnp.take`` inside a ``lax.cond``, so the op is safe for ANY ancestor
    vector (residual's shuffled tail, user-supplied indices, ...). ANY
    span is handled in-kernel (merge-path window walk) — only
    unsortedness routes to the XLA gather.
    """
    d, n = X.shape
    if not _use_pallas(d, n, tile, X.dtype, interpret):
        return jnp.take(X, a, axis=1)

    nb = n // tile
    qrows = tile // FOLD
    nrows = n // FOLD
    lo = (a[::tile] >> 7).astype(jnp.int32)
    hi = (a[tile - 1::tile] >> 7).astype(jnp.int32)
    srows = jnp.minimum(lo, nrows - WROWS)
    span = jnp.maximum(jnp.minimum(hi, nrows - 1) - srows, 0)
    wcnt = span // WROWS + 1
    woff = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(wcnt)[:-1].astype(jnp.int32)])
    ok = jnp.all(a[1:] >= a[:-1]) & (a[0] >= 0) & (a[-1] < n)

    def pallas_branch(args):
        X_, a_, srows_, wcnt_, woff_ = args
        xf = X_.reshape(d, nrows, FOLD)
        af = a_.reshape(nb, qrows, FOLD)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, qrows, FOLD), lambda b, *_: (b, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((d, 1, qrows, FOLD),
                                   lambda b, *_: (0, b, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, d, WROWS, FOLD), X_.dtype),
                pltpu.VMEM((qrows, FOLD), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )

        def build_and_call():
            # force_tpu_interpret_mode is consulted when pallas_call is
            # CONSTRUCTED, so construction happens inside the context.
            call = pl.pallas_call(
                functools.partial(_take_kernel, nb=nb, qrows=qrows, d=d,
                                  n=n),
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((d, nb, qrows, FOLD),
                                               X_.dtype),
            )
            return call(srows_, wcnt_, woff_, af, xf).reshape(d, n)

        if interpret:
            with pltpu.force_tpu_interpret_mode():
                return build_and_call()
        return build_and_call()

    def xla_branch(args):
        X_, a_, *_ = args
        return jnp.take(X_, a_, axis=1)

    return lax.cond(ok, pallas_branch, xla_branch,
                    (X, a, srows, wcnt, woff))


def inverse_cdf_apply(cdf: jnp.ndarray, positions: jnp.ndarray,
                      X: jnp.ndarray, *, cdf128: jnp.ndarray = None,
                      tile: int = SEARCH_TILE,
                      interpret: bool = False,
                      local_base=None, _ablate=None
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused inverse-CDF resample: ancestors AND resampled state in one
    kernel pass.

    ``cdf`` [N] is the inclusive weight cumsum — normalization is NOT
    required: the search is scale-invariant, so callers may pass the raw
    cumsum and scale ``positions`` by ``cdf[-1]`` (the exp-space filter
    fast path does exactly that, skipping the softmax pass).
    ``positions`` [N] are SORTED resampling positions (systematic /
    stratified / sorted-uniform multinomial — see
    ``resampling.classic.POSITION_FNS`` — times the cdf total),
    ``X`` [d, N] packed particles. Returns ``(X[:, a], a)`` with
    ``a[i] = #{j: cdf[j] <= positions[i]}`` clipped to N-1 — identical
    semantics to the merge-rank fallback.

    ``cdf128`` optionally supplies the 128-strided cdf
    (``cdf[127::128]``) when the caller already has it
    (``ops/cumsum.blocked_cumsum`` emits it for free), skipping the
    strided-slice pass.

    ``local_base`` (traced int32 scalar, a multiple of 128) switches to
    the LOCAL-BLOCK mode for the sharded ring exchange: ``cdf`` stays
    the GLOBAL [N] cumsum, ``positions`` are this shard's [L] queries,
    and ``X`` is the shard's local [d, L] block holding global columns
    [local_base, local_base + L). Ancestors come back in GLOBAL indices
    for every query; resampled values are valid only where the ancestor
    lies in the local block (the caller masks by that range and fills
    the rest from later ring rounds).
    """
    d, nloc = X.shape
    n = cdf.shape[0]
    nq = positions.shape[0]
    shapes_ok = (nq % tile == 0 and nloc % FOLD == 0
                 and nloc >= SWINDOW
                 and (local_base is not None or nloc == n))
    if not (shapes_ok and _use_pallas(d, n, tile, X.dtype, interpret,
                                      tile_max=SWINDOW // 2,
                                      window=SWINDOW)):
        a = _merge_rank_ancestors(cdf, positions)
        if local_base is None:
            return jnp.take(X, a, axis=1), a
        rel = jnp.clip(a - local_base, 0, nloc - 1)
        return jnp.take(X, rel, axis=1), a

    nb = nq // tile
    qrows = tile // FOLD
    nrows = n // FOLD
    # Coarse block placement from the 128-STRIDED cdf: r128 = #{k:
    # cdf[(k+1)*128-1] <= q} is exactly the fold row of rank(q) (rows
    # before r128 are fully <= q, row r128's last element is > q).
    # Window starts and per-block window counts need only [n/128]-vs-
    # (nb+1) sorted ranks (block b's queries resolve in rows
    # [r128[b], r128[b+1]]; the final query uses the last position
    # exactly). Both sides are sorted, so rank-by-merge (two tiny
    # argsorts, ~0.02 ms) beats searchsorted's gather rounds
    # (~0.12 ms) — benchmarks/probe_cumsum.
    if cdf128 is None:
        cdf128 = cdf[FOLD - 1::FOLD]
    m = cdf128.shape[0]
    q = jnp.concatenate([positions[::tile], positions[-1:]])
    merged = jnp.concatenate([cdf128, q.astype(cdf128.dtype)])
    rank = jnp.argsort(jnp.argsort(merged))
    r128 = (rank[m:] - jnp.arange(nb + 1)).astype(jnp.int32)
    srows = jnp.minimum(r128[:-1], nrows - SROWS)
    span = jnp.maximum(jnp.minimum(r128[1:], nrows - 1) - srows, 0)
    wcnt = span // SROWS + 1
    woff = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(wcnt)[:-1].astype(jnp.int32)])

    cf = cdf.reshape(nrows, FOLD)
    pf = positions.reshape(nb, qrows, FOLD)
    xf = X.reshape(d, nloc // FOLD, FOLD)
    if local_base is None:
        brow = jnp.zeros((1,), jnp.int32)
    else:
        brow = (jnp.asarray(local_base, jnp.int32) // FOLD)[None]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, qrows, FOLD), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((d, 1, qrows, FOLD),
                         lambda b, *_: (0, b, 0, 0)),
            pl.BlockSpec((1, qrows, FOLD), lambda b, *_: (b, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, SROWS, FOLD), cdf.dtype),
            pltpu.VMEM((2, d, SROWS, FOLD), X.dtype),
            pltpu.VMEM((qrows, FOLD), jnp.int32),
            pltpu.VMEM((8, FOLD), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )

    def build_and_call():
        call = pl.pallas_call(
            functools.partial(_search_kernel, nb=nb, qrows=qrows, d=d,
                              n=n, local=local_base is not None,
                              ablate=_ablate),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((d, nb, qrows, FOLD), X.dtype),
                jax.ShapeDtypeStruct((nb, qrows, FOLD), jnp.int32),
            ],
        )
        y, a = call(brow, srows, wcnt, woff, pf, cf, xf)
        return y.reshape(d, nq), a.reshape(nq)

    if interpret:
        with pltpu.force_tpu_interpret_mode():
            return build_and_call()
    return build_and_call()
