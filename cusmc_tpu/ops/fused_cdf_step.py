"""Fused UNBIASED inverse-CDF filter step: systematic / stratified
resample + propagate + reweight in ONE kernel pass over HBM.

This is the true TPU equivalent of the reference's fused sample+pdf
kernel chains (``/root/reference/src/mvn_dist.cu.cpp:33-172,455-668``,
``mvt_dist.cu.cpp:63-223,356-571``) WITHOUT the Metropolis finite-sweep
bias asterisk that keeps ``ops/fused_step.py`` opt-in: systematic /
stratified inverse-CDF positions are exact, so the resampling law is
identical to the XLA path's (``resampling/classic.py``).

MEASURED OUTCOME (round 4, benchmarks/RESULTS.md "fused UNBIASED
inverse-CDF engine"): statistically validated on-chip (Kalman logZ
323.3 vs oracle 324.0; ancestor law exact) but SLOWER than the
composed XLA pipeline (blocked-cumsum kernel -> search kernel -> XLA
epilogue) at every d in 2..128 (0.80-0.92x) — the fusible
intermediate traffic is only ~0.05 ms/step at d=2 while the walk is
per-particle compute-bound and the Mosaic epilogue costs ~2x XLA's
streaming codegen for the same math. ``engine="auto"`` therefore never
selects this kernel; ``engine="pallas"`` with a CDF resampler is the
explicit opt-in. The file stays: it is the honest negative-result
artifact, its local-base search mode powers the sharded ring
exchange's fused round 0, and its fold-layout epilogue is the pattern
future fused kernels should copy.

Structure: the merge-path window walk of
``ops/monotone_gather._search_kernel`` (per-block dynamic window count
over a 128-strided coarse placement, double-buffered DMAs across the
walk AND across grid blocks) computes ancestors and gathers the
ancestor state into VMEM scratch — then, instead of writing the
resampled state back to HBM for XLA to re-read (propagate) and re-read
again (reweight), the block finishes in-register: Box-Muller process
noise from the core PRNG, the integer-df one-log chi-square (or
fixed-round Marsaglia-Tsang) MVT scale mixture, MXU matvecs for
``G @ x_anc``, ``Q @ z``, ``F @ x_new``, ``Li @ resid``, and the
observation log-density — one HBM read of (cdf, X), one write of
(x_new, loglik, ancestors). The per-particle traffic drops from ~4
state round-trips (resample write + propagate read/write + reweight
read) to the algorithmic minimum.

Positions are generated IN-KERNEL from two scalars (systematic: the
shared offset u; stratified: per-slot uniforms from the block's PRNG
stream), so the [N] position array of the unfused path never touches
HBM. The coarse per-block window placement therefore uses the
DETERMINISTIC position bounds (slot k's position lies in
[k*pscale, (k+1)*pscale)), costing at most one extra window per block.

Window rows (``sr``) default to 8 (one vreg); measured optimum is
sr=16 / tile=1024 — sr=8 halves phase B's select chains but groups
straddle more windows, and sr=32 reverses it (RESULTS.md). Query
groups gate their vector work on prefetched per-group window ranges.

Validated against the XLA fast path and the Kalman oracle in
tests/test_fused_cdf_step.py and on-chip by
benchmarks/validate_fused_tpu.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cusmc_tpu.ops.fused_step import (
    MAX_MXU_DIM,
    _MT_ROUNDS,
    _to_normals,
    _to_uniform,
)
from cusmc_tpu.ops.monotone_gather import FOLD, _phase_b, _select_rows
from cusmc_tpu.ops.random import MAX_INTEGER_DF


def _mt_gamma_fold(alpha, bits, qrows, dtype=jnp.float32):
    """Fixed-round Marsaglia-Tsang Gamma(alpha) in fold layout: ``bits``
    [3 * _MT_ROUNDS * qrows, FOLD] -> [qrows, FOLD] (ops/fused_step's
    ``_mt_gamma`` operates on [*, tile] rows; this variant keeps the
    walk's [qrows, FOLD] layout so no relayout is needed)."""
    dd = alpha - 1.0 / 3.0
    c = 1.0 / jnp.sqrt(9.0 * dd)
    accepted = jnp.zeros((qrows, FOLD), jnp.bool_)
    out = jnp.broadcast_to(alpha.astype(dtype), (qrows, FOLD))
    for i in range(_MT_ROUNDS):
        b = bits[3 * i * qrows:(3 * i + 3) * qrows]
        x = _to_normals(b[:qrows], b[qrows:2 * qrows], dtype)
        v = (1.0 + c * x) ** 3
        u = _to_uniform(b[2 * qrows:], dtype)
        ok = (v > 0.0) & (jnp.log(u) < 0.5 * x * x + dd - dd * v
                          + dd * jnp.log(jnp.where(v > 0.0, v, 1.0)))
        take = ok & ~accepted
        out = jnp.where(take, dd.astype(dtype) * v, out)
        accepted |= ok
    return out

DEFAULT_TILE = 1024
DEFAULT_SROWS = 16  # measured optimum (RESULTS.md round-4 sweep):
                    # sr=8 halves the phase-B chains but doubles window
                    # straddles; sr=32 reverses it


def _fused_cdf_kernel(
    # scalar prefetch
    seed_ref,     # [2] int32 PRNG seed material (step-dependent)
    srows_ref,    # [nb] int32 first window fold-row per block
    wcnt_ref,     # [nb] int32 window count per block
    woff_ref,     # [nb] int32 cumulative window count (DMA slot parity)
    grows_ref,    # [nb*gpb+1] int32 cdf fold-row of each QUERY-GROUP
                  # boundary: group gi's sorted queries resolve in rows
                  # [grows[gi], grows[gi+1]] — the walk gates each
                  # group's vector work on a SCALAR window-range check,
                  # so a group touches only its own ~span/sr windows
                  # (without this the group loop ran phase A on every
                  # window the block walked: O(groups x windows) per
                  # block, measured 2.37 ms/step at tile=2048 vs 2.24 at
                  # 1024 BECAUSE bigger tiles made that product grow)
    # inputs
    cdf_ref,      # [nrows, FOLD] inclusive weight cumsum (ANY/HBM)
    x_ref,        # [d, nrows, FOLD] particles (ANY/HBM)
    y_ref,        # [k, 1] observation (VMEM)
    G_ref,        # [d, d] (VMEM)
    Q_ref,        # [d, d] transition cov sqrt (VMEM)
    F_ref,        # [k, d] (VMEM)
    Li_ref,       # [k, k] inverse obs Cholesky (VMEM)
    sc_ref,       # [4] f32 SMEM: (u, pscale, df, log_norm)
    # outputs
    xo_ref,       # [d, tile]
    ll_ref,       # [1, tile]
    anc_ref,      # [1, qrows, FOLD] int32 global ancestors
    # scratch
    cwin,         # [2, SR, FOLD] cdf windows (double-buffered)
    xwin,         # [2, d, SR, FOLD] state windows
    xa,           # [d, qrows, FOLD] resolved ancestor state
    found,        # [qrows, FOLD] int32
    sems,         # DMA semaphores (2, 2)
    *,
    nb: int, qrows: int, d: int, k: int, n: int, sr: int, tile: int,
    noise: str, df_int, mode: str,
):
    b = pl.program_id(0)
    nrows = n // FOLD
    golden = jnp.int32(-1640531527)  # 0x9E3779B9 as int32
    pltpu.prng_seed(seed_ref[0], seed_ref[1] ^ (b * golden))

    def rows0(blk, w):
        return jnp.minimum(srows_ref[blk] + w * sr, nrows - sr)

    def start(slot, blk, w):
        r0 = rows0(blk, w)
        pltpu.make_async_copy(
            cdf_ref.at[pl.ds(r0, sr), :],
            cwin.at[slot], sems.at[0, slot]).start()
        pltpu.make_async_copy(
            x_ref.at[:, pl.ds(r0, sr), :],
            xwin.at[slot], sems.at[1, slot]).start()

    def wait(slot, blk, w):
        r0 = rows0(blk, w)
        pltpu.make_async_copy(
            cdf_ref.at[pl.ds(r0, sr), :],
            cwin.at[slot], sems.at[0, slot]).wait()
        pltpu.make_async_copy(
            x_ref.at[:, pl.ds(r0, sr), :],
            xwin.at[slot], sems.at[1, slot]).wait()

    w_n = wcnt_ref[b]
    base = woff_ref[b]
    two = jnp.int32(2)

    @pl.when(b == 0)
    def _():
        start(0, 0, 0)

    found[...] = jnp.zeros((qrows, FOLD), jnp.int32)

    # In-kernel positions: slot g of this block is b*tile + q*FOLD + l
    # (row-major fold); p = (g + u) * pscale with pscale = total/N.
    # Systematic: one shared u (SMEM scalar). Stratified: per-slot
    # uniforms from the block's PRNG stream — sorted by construction
    # ((g + u_g) strictly increases since u in [0,1)).
    row_iota = lax.broadcasted_iota(jnp.int32, (qrows, FOLD), 0)
    lane_iota = lax.broadcasted_iota(jnp.int32, (qrows, FOLD), 1)
    g_idx = (b * tile + row_iota * FOLD + lane_iota).astype(jnp.float32)
    if mode == "stratified":
        uq = _to_uniform(pltpu.prng_random_bits((qrows, FOLD)))
    else:
        uq = sc_ref[0]
    p_all = (g_idx + uq) * sc_ref[1]

    gpb = qrows // 8

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
        for gi in range(gpb):
            g = gi * 8
            h = min(8, qrows - g)
            # Scalar range gate: this group's queries live in cdf rows
            # [grows[·], grows[·+1]]; skip windows outside entirely.
            glo = grows_ref[b * gpb + gi]
            ghi = grows_ref[b * gpb + gi + 1]
            in_range = (r0 + sr > glo) & (r0 <= ghi)

            @pl.when(in_range | last)
            def _(g=g, h=h, slot=slot, r0=r0, last=last):
                cw = cwin[slot]
                rm = jnp.take_along_axis(
                    cw, jnp.full((sr, FOLD), FOLD - 1, jnp.int32),
                    axis=1)
                p = p_all[g:g + h]
                c = jnp.zeros((h, FOLD), jnp.int32)
                for r in range(sr):
                    c = c + (rm[r:r + 1, :] <= p).astype(jnp.int32)
                active = (found[g:g + h, :] == 0) & ((c < sr) | last)

                @pl.when(jnp.any(active))
                def _(p=p, c=c, active=active, g=g, h=h, slot=slot,
                      r0=r0, cw=cw):
                    c_eff = jnp.minimum(c, sr - 1)
                    masks = [(c_eff == r) & active for r in range(1, sr)]
                    rlow = _phase_b(cw, masks, p)
                    anc = jnp.minimum((r0 + c_eff) * FOLD + rlow, n - 1)
                    anc_ref[0, g:g + h, :] = jnp.where(
                        active, anc, anc_ref[0, g:g + h, :])
                    for ri in range(d):
                        v = _select_rows(xwin[slot, ri], masks, rlow)
                        xa[ri, g:g + h, :] = jnp.where(
                            active, v, xa[ri, g:g + h, :])
                    found[g:g + h, :] = jnp.where(
                        active, 1, found[g:g + h, :])

        return 0

    lax.fori_loop(0, w_n, body, 0)

    # ---- propagate + reweight, fully in-register (ops/fused_step.py
    # stages, minus the Metropolis part) — all in the [.., qrows, FOLD]
    # FOLD LAYOUT the walk resolved into: rank-3 dot_general contracts
    # the d axis without ever relayouting sublanes to lanes (probed
    # exact on v5e, benchmarks/probe_reshape.py; the reshape-to-[d,tile]
    # variant measured ~1.5 ms/step of pure relayout at N=1M), and the
    # fold-shaped outputs reshape to [d, N] for free in HBM.
    x_cur = xa[...]                       # [d, qrows, FOLD]
    prec = (jax.lax.Precision.HIGHEST
            if max(d, k) <= 8 and x_cur.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    def matvec(A_ref, Xv):
        return jax.lax.dot_general(
            A_ref[...], Xv.astype(A_ref.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)

    mean = matvec(G_ref, x_cur)
    zbits = pltpu.prng_random_bits((2 * d * qrows, FOLD))
    z = _to_normals(zbits[:d * qrows], zbits[d * qrows:]
                    ).reshape(d, qrows, FOLD)
    qz = matvec(Q_ref, z)
    df = sc_ref[2]
    if noise == "mvt":
        if df_int is not None:
            m, odd = divmod(df_int, 2)
            cbits = pltpu.prng_random_bits(((m + 2 * odd) * qrows, FOLD))
            if m > 0:
                prod = _to_uniform(cbits[0:qrows])
                for j in range(1, m):
                    prod = prod * _to_uniform(cbits[j * qrows:
                                                    (j + 1) * qrows])
                g = -2.0 * jnp.log(jnp.maximum(prod, 1e-38))
            else:
                g = jnp.zeros((qrows, FOLD), jnp.float32)
            if odd:
                zc = _to_normals(cbits[m * qrows:(m + 1) * qrows],
                                 cbits[(m + 1) * qrows:(m + 2) * qrows])
                g = g + zc * zc
        else:
            gbits = pltpu.prng_random_bits((3 * _MT_ROUNDS * qrows, FOLD))
            g = 2.0 * _mt_gamma_fold(0.5 * df, gbits, qrows)
        qz = qz * jnp.sqrt(df / g)[None]
    x_new = mean + qz                     # [d, qrows, FOLD]
    xo_ref[:, 0] = x_new

    fx = matvec(F_ref, x_new)
    resid = y_ref[...][:, :, None] - fx   # y [k, 1] -> [k, 1, 1] bcast
    zz = matvec(Li_ref, resid)
    quad = jnp.sum(zz * zz, axis=0)       # [qrows, FOLD]
    log_norm = sc_ref[3]
    if noise == "mvt":
        ll_ref[0] = log_norm - 0.5 * (df + k) * jnp.log1p(quad / df)
    else:
        ll_ref[0] = log_norm - 0.5 * quad


def _merge_rank_i32(sorted_ref, sorted_queries):
    m = sorted_ref.shape[0]
    merged = jnp.concatenate(
        [sorted_ref, sorted_queries.astype(sorted_ref.dtype)])
    rank = jnp.argsort(jnp.argsort(merged))
    return (rank[m:]
            - jnp.arange(sorted_queries.shape[0])).astype(jnp.int32)


def cdf_auto_tile(n: int, dk: int) -> int:
    """Measured-optimum tile per state dimension (RESULTS.md round-4
    sweep at sr=16: d=2/8 -> 1024, d=16 -> 4096, d=32 -> 2048,
    d>=64 -> 1024; the kernel is per-particle compute-bound, so bigger
    tiles buy little and cost VMEM). Falls to the largest 1024-multiple
    power of two dividing n when the table entry doesn't."""
    if dk <= 8 or dk > 32:
        want = 1024
    elif dk <= 16:
        want = 4096
    else:
        want = 2048
    t = 1024
    while t * 2 <= min(want, n // 2) and n % (t * 2) == 0:
        t *= 2
    return t if n % t == 0 else 1024


@functools.partial(
    jax.jit,
    static_argnames=("noise", "mode", "tile", "sr", "interpret", "df_int"))
def fused_cdf_filter_step(key, cdf, cdf128, X, y_t, G, Q, F, Li, df,
                          log_norm, *, noise: str = "mvn",
                          mode: str = "systematic", tile: int = None,
                          sr: int = DEFAULT_SROWS, interpret: bool = False,
                          df_int: int = None):
    """One fused systematic/stratified filter step on packed particles.

    ``cdf`` [N] is the UNNORMALIZED inclusive weight cumsum (the search
    is scale-invariant; in-kernel positions scale by ``total/N``),
    ``cdf128`` its 128-strided byproduct (``ops/cumsum.blocked_cumsum``
    emits both), ``X`` [d, N]. Returns (X_new [d, N], loglik [N],
    ancestors [N] int32) with ancestor law IDENTICAL to the XLA path's
    ``inverse_cdf_apply`` (exact inverse-CDF positions — no proposal
    bias, unlike the windowed-Metropolis ``fused_filter_step``).
    """
    d, n = X.shape
    k = F.shape[0]
    if tile is None:
        tile = cdf_auto_tile(n, max(d, k))
    if n % tile != 0 or tile % (8 * FOLD) != 0:
        raise ValueError(f"N={n} must be divisible by tile={tile}, tile "
                         f"by {8 * FOLD} (whole query groups)")
    if n < 2 * sr * FOLD or n % FOLD != 0:
        raise ValueError(f"N={n} too small for the {sr * FOLD}-element "
                         f"window walk")
    if n > 1 << 24:
        raise ValueError(f"N={n} > 2^24: query indices are no longer "
                         f"exact in f32, breaking the group-bound "
                         f"coverage guarantee")
    if max(d, k) > MAX_MXU_DIM:
        raise ValueError(f"fused cdf step supports d,k <= {MAX_MXU_DIM}")
    if mode not in ("systematic", "stratified"):
        raise ValueError(f"mode {mode!r} not in (systematic, stratified)")
    if X.dtype != jnp.float32 or cdf.dtype != jnp.float32:
        raise ValueError("fused cdf step is float32-only")
    if df_int is not None and not 1 <= df_int <= MAX_INTEGER_DF:
        raise ValueError(f"df_int={df_int} outside [1, {MAX_INTEGER_DF}]")

    nb = n // tile
    qrows = tile // FOLD
    nrows = n // FOLD

    k_u, k_seed = jax.random.split(key)
    u = jax.random.uniform(k_u, (), jnp.float32)
    seed = jax.random.bits(k_seed, (2,), jnp.uint32).astype(jnp.int32)

    total = cdf128[-1]
    pscale = total / jnp.float32(n)
    # Coarse placement from DETERMINISTIC position bounds at QUERY-GROUP
    # granularity (1024 queries = one [8, FOLD] phase group). The bound
    # values are computed with the SAME single-rounding f32 product the
    # kernel uses for its positions — fl(g * pscale) with g = group
    # start, exactly fl((g + u) * pscale) at u = 0 — and ranked with the
    # same count-<= semantics the kernel's window counts use
    # (_merge_rank_i32's stable argsort places a tied query AFTER the
    # ref value). f32 monotonicity then guarantees every query's true
    # crossing row lies in [grows[gi], grows[gi+1]] INCLUSIVE, with no
    # ulp inversion and no tie escape (round-5 advisor finding: the old
    # fl(gi * fl(gq*pscale)) bounds could invert by an ulp against the
    # kernel's product and silently force-resolve a boundary query on
    # the last window). Block quantities derive from the group table
    # (tile is a multiple of 1024), and the kernel uses the group rows
    # to gate each group's vector work to its own windows.
    gq = FOLD * 8
    ngrp = n // gq
    gpb = tile // gq
    # g values up to n are exact in f32 for n <= 2^24; one multiply.
    q = (jnp.arange(ngrp + 1, dtype=jnp.float32) * gq) * pscale
    grows = _merge_rank_i32(cdf128, q)          # [ngrp + 1]
    rb = grows[::gpb]                           # block boundaries [nb+1]
    srows = jnp.minimum(rb[:-1], nrows - sr)
    span = jnp.maximum(jnp.minimum(rb[1:], nrows - 1) - srows, 0)
    wcnt = span // sr + 1
    woff = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(wcnt)[:-1].astype(jnp.int32)])

    sc = jnp.stack([u, pscale,
                    jnp.asarray(df if df is not None else 1.0, jnp.float32),
                    jnp.asarray(log_norm, jnp.float32)])
    cf = cdf.reshape(nrows, FOLD)
    xf = X.reshape(d, nrows, FOLD)
    y2 = jnp.asarray(y_t, jnp.float32).reshape(k, 1)
    G, Q, F = (jnp.asarray(a, jnp.float32) for a in (G, Q, F))
    Li = jnp.asarray(Li, jnp.float32)

    mat_spec = pl.BlockSpec(memory_space=None)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # cdf
            pl.BlockSpec(memory_space=pl.ANY),      # X
            mat_spec,                               # y [k, 1]
            mat_spec,                               # G
            mat_spec,                               # Q
            mat_spec,                               # F
            mat_spec,                               # Li
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (u, pscale, df, ln)
        ],
        out_specs=[
            pl.BlockSpec((d, 1, qrows, FOLD), lambda b, *_: (0, b, 0, 0)),
            pl.BlockSpec((1, qrows, FOLD), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((1, qrows, FOLD), lambda b, *_: (b, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, sr, FOLD), jnp.float32),
            pltpu.VMEM((2, d, sr, FOLD), jnp.float32),
            pltpu.VMEM((d, qrows, FOLD), jnp.float32),
            pltpu.VMEM((qrows, FOLD), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    kernel = functools.partial(
        _fused_cdf_kernel, nb=nb, qrows=qrows, d=d, k=k, n=n, sr=sr,
        tile=tile, noise=noise, df_int=df_int, mode=mode)

    def build_and_call():
        call = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((d, nb, qrows, FOLD), jnp.float32),
                jax.ShapeDtypeStruct((nb, qrows, FOLD), jnp.float32),
                jax.ShapeDtypeStruct((nb, qrows, FOLD), jnp.int32),
            ],
        )
        return call(seed, srows, wcnt, woff, grows, cf, xf, y2, G, Q, F,
                    Li, sc)

    if interpret:
        with pltpu.force_tpu_interpret_mode():
            x_new, ll, a = build_and_call()
    else:
        x_new, ll, a = build_and_call()
    return x_new.reshape(d, n), ll.reshape(n), a.reshape(n)
