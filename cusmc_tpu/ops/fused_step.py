"""Fully fused Pallas filter step: resample + propagate + reweight in ONE
kernel pass over HBM, with in-kernel hardware RNG.

TPU-native replacement for the reference's entire CUDA kernel inventory
(SURVEY.md §2 "Native components"): the 4-kernel sample chains
(``/root/reference/src/mvn_dist.cu.cpp:15-172``, ``mvt_dist.cu.cpp:63-223``),
the 3-kernel pdf chains (``mvn_dist.cu.cpp:455-668``, ``mvt_dist.cu.cpp:
356-571``), the device-side Marsaglia-Tsang gamma sampler
(``mvt_dist.cu.cpp:20-55``) and the host-side Metropolis resampler
(``src/samplers.cpp:7-36``) — collapsed into one kernel instead of six
launches + host round-trips per timestep.

Resampling is the *windowed Megopolis* scheme (memory-coalesced Metropolis,
cf. arXiv:2109.13504): one global random offset S per step places a 2-tile
candidate window over the particle array; each of the B Metropolis sweeps
proposes a contiguous VMEM slice of the window at a per-tile random
sub-offset. The proposal is uniform over the window and independent of the
chain state, so the independence-MH ratio's q terms cancel and every
per-particle chain leaves the weight distribution invariant — same family
as the reference's resampler, with candidates arriving as dynamic slices
instead of random gathers. The window re-randomizes every step.

Per-particle per-step HBM traffic: read X + logw once, write X_new +
loglik + ancestors once. All randomness (acceptance uniforms, proposal
offsets, Box-Muller process noise, fixed-round Marsaglia-Tsang gamma for
the MVT scale mixture) comes from the core PRNG — zero HBM.

Round-3 rewrite (the round-2 version lost 3.4x to the XLA packed path):
- window DMAs are double-buffered ACROSS grid steps (tile i prefetches
  tile i+1's window while computing) — the round-2 kernel serialized a
  start/wait pair per tile, stalling every grid step on HBM latency;
- Metropolis accepts run in EXP space (the window's log-weights are
  exponentiated once after the DMA): ``u * w_cur < w_cand`` replaces
  ``log u < lw_cand - lw_cur``, deleting a transcendental per particle
  per sweep — the same trick as the XLA fast path
  (``particle_filter._fast_exp_step_factory``);
- the propagate/reweight matvecs are in-kernel MXU matmuls on
  VMEM-resident matrices at EVERY d (measured faster than SMEM-scalar
  unrolled VPU FMAs even at d=2, matching the XLA-path finding in
  ops/packed.py) — the analog of the reference's arbitrary-d tiled
  kernels (``mvn_dist.cu.cpp:33-101``, TILE_SIZE=16).

Validated against the XLA path in tests/test_fused_step.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cusmc_tpu.ops.random import MAX_INTEGER_DF

DEFAULT_TILE = 2048
MAX_MXU_DIM = 128   # d,k cap (VMEM window budget at the auto tile)
_MT_ROUNDS = 4  # Marsaglia-Tsang proposal rounds (see ops/random.py)


def _to_uniform(bits, dtype=jnp.float32):
    """U(0,1) from raw PRNG bits; strictly positive for safe log().

    Bits arrive as int32 and Mosaic lacks a uint32->f32 cast, so keep the
    low 23 bits (always non-negative as int32) for the mantissa.

    Bits are drawn in BULK (one ``pltpu.prng_random_bits`` call per
    logical group, sliced into rows): the round-2 kernel issued ~30 small
    prng calls per tile and the per-call overhead dominated the step
    (measured 432 M vs this layout's bulk draws; see the kernel body).
    """
    u = (bits & 0x007FFFFF).astype(dtype) * (1.0 / (1 << 23))
    return jnp.maximum(u, 1e-12)


def _to_normals(b1, b2, dtype=jnp.float32):
    """Box-Muller normals from two bit rows."""
    u1 = _to_uniform(b1, dtype)
    u2 = _to_uniform(b2, dtype)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(2.0 * math.pi * u2)


def _mt_gamma(alpha, bits, dtype=jnp.float32):
    """Fixed-round Marsaglia-Tsang Gamma(alpha) for (traced) alpha >= 1.
    ``bits`` [3 * _MT_ROUNDS, T] raw PRNG bits (3 rows per round: the
    Box-Muller pair + the acceptance uniform) — ops/random.py's sampler,
    in-kernel."""
    t = bits.shape[1]
    d = alpha - 1.0 / 3.0
    c = 1.0 / jnp.sqrt(9.0 * d)
    accepted = jnp.zeros((1, t), jnp.bool_)
    out = jnp.broadcast_to(alpha.astype(dtype), (1, t))
    for i in range(_MT_ROUNDS):
        x = _to_normals(bits[3 * i:3 * i + 1], bits[3 * i + 1:3 * i + 2],
                        dtype)
        v = (1.0 + c * x) ** 3
        u = _to_uniform(bits[3 * i + 2:3 * i + 3], dtype)
        ok = (v > 0.0) & (jnp.log(u) < 0.5 * x * x + d - d * v
                          + d * jnp.log(jnp.where(v > 0.0, v, 1.0)))
        take = ok & ~accepted
        out = jnp.where(take, d.astype(dtype) * v, out)
        accepted |= ok
    return out


def auto_tile(n: int, dk: int, state_itemsize: int = 4) -> int:
    """Largest power-of-two tile that divides n, sized so the double-
    buffered [2, d, 2*tile] window + live temporaries fit VMEM: measured
    optimum ~tile * d = 128K lanes (d=2 -> 16384 ... d=64 -> 2048).
    f32 d=128 at 1024 sits ~7% over the 16M scoped-VMEM limit depending
    on compiler mood, so it drops to 512; the bf16 window is half the
    bytes and measured +9% at 1024 vs 512."""
    if dk >= 128:
        cap = 512 * (4 // state_itemsize)
    else:
        cap = 131072 // max(dk, 8)
    t = 512
    # n // 2: the kernel needs >= 2 tiles (its window spans two).
    while t * 2 <= min(cap, 16384, n // 2) and n % (t * 2) == 0:
        t *= 2
    return t


def _step_kernel(
    # scalar prefetch
    s_ref,        # [2] int32: window offsets (primary pair, extra tile)
    seed_ref,     # [2] int32: PRNG seed material (step-dependent)
    # tensor/scalar inputs
    xw_ref,       # [d, N] particles (ANY/HBM)
    lw_ref,       # [1, N] log-weights (ANY/HBM)
    y_ref,        # [k, 1] observation (VMEM)
    G_ref,        # [d, d] (VMEM)
    Q_ref,        # [d, d] transition cov sqrt (VMEM)
    F_ref,        # [k, d] (VMEM)
    Li_ref,       # [k, k] inverse obs Cholesky (VMEM)
    mp_ref,       # [2] float32: (df, obs log-norm) (SMEM)
    # outputs
    xo_ref,       # [d, tile]
    ll_ref,       # [1, tile]
    a_ref,        # [1, tile] int32 global ancestor indices
    # scratch
    xwin_ref,     # [2, d, wt*tile] VMEM candidate windows (double-buffered)
    wwin_ref,     # [2, 1, wt*tile] VMEM exp-space weights
    sem,          # DMA semaphores (2, wt, 2): (kind, window tile, slot)
    *,
    n: int, tile: int, d: int, k: int, num_sweeps: int, noise: str,
    df_int, num_window_tiles: int = 2,
):
    i = pl.program_id(0)
    nb = n // tile
    wt = num_window_tiles
    # Mix the tile id multiplicatively (golden-ratio hash, wrapped to
    # int32): adjacent raw seeds can yield correlated streams, which would
    # correlate resampling across tiles and inflate estimator variance.
    golden = jnp.int32(-1640531527)  # 0x9E3779B9 as int32
    pltpu.prng_seed(seed_ref[0], seed_ref[1] ^ (i * golden))

    # Window = two TILE-ALIGNED source tiles (i + s, i + s + 1) mod nb —
    # contiguous mod n, so no extended/concatenated input array (the
    # round-2 kernel re-materialized an [d, N + 2*tile] concat per step).
    # The step's coarse offset s is in tile units; within-window coverage
    # comes from the 128-aligned per-sweep slice offsets plus the fine
    # lane rotation below, so all global offsets remain reachable.
    # num_window_tiles=3 appends ONE extra tile at the INDEPENDENT
    # coarse offset s2 (1.5x window DMA): per-sweep proposal slices then
    # span [0, 2*tile], so candidates mix two separated regions of the
    # particle array per step — the bias-reduction experiment for the
    # windowed proposal (VERDICT round-3 item 5).
    def half_of(j, h):
        base = s_ref[0] + h if h < 2 else s_ref[1]
        w = jax.lax.rem(jnp.int32(j) + base, jnp.int32(nb)) * tile
        return pl.multiple_of(w, 128)

    def _copies(slot, j):
        for h in range(wt):
            w = half_of(j, h)
            yield pltpu.make_async_copy(
                xw_ref.at[:, pl.ds(w, tile)],
                xwin_ref.at[slot, :, pl.ds(h * tile, tile)],
                sem.at[0, h, slot])
            yield pltpu.make_async_copy(
                lw_ref.at[:, pl.ds(w, tile)],
                wwin_ref.at[slot, :, pl.ds(h * tile, tile)],
                sem.at[1, h, slot])

    def start(slot, j):
        for cp in _copies(slot, j):
            cp.start()

    def wait(slot, j):
        for cp in _copies(slot, j):
            cp.wait()

    # Double-buffered across grid steps: prefetch tile i+1's window
    # while computing tile i (the round-2 kernel's serialized start/wait
    # per tile was its main deficit vs XLA).
    slot = jax.lax.rem(i, jnp.int32(2))
    nxt = jax.lax.rem(i + 1, jnp.int32(2))

    @pl.when(i == 0)
    def _():
        start(0, 0)

    @pl.when(i + 1 < nb)
    def _():
        start(nxt, i + 1)

    wait(slot, i)
    ws = half_of(i, 0)

    # One fine lane rotation r in [0, 128) per step de-aligns the lane
    # classes (after it, per-sweep slices can be 128-aligned — Mosaic
    # requires aligned vector loads — without restricting ancestry to
    # fixed lane residues across steps). The weight window is
    # exponentiated in the same pass: accepts below run in exp space
    # (weights arrive max-normalized from log_normalize, so exp is safe).
    r = pltpu.prng_random_bits((1, 1))[0, 0] & 127
    wwin_ref[slot] = jnp.exp(pltpu.roll(wwin_ref[slot], -r, 1))
    xw = xwin_ref[slot]
    if xw.dtype == jnp.bfloat16:
        # tpu.dynamic_rotate lacks 16-bit support; the int32 view packs
        # SUBLANE pairs (lanes preserved 1:1 — verified on-chip,
        # benchmarks/probe_bf16_roll rationale in fused_filter_step), so
        # an int32 lane roll rotates bf16 lanes exactly. Needs even d.
        xi = pltpu.roll(pltpu.bitcast(xw, jnp.int32), -r, 1)
        xwin_ref[slot] = pltpu.bitcast(xi, jnp.bfloat16)
    else:
        xwin_ref[slot] = pltpu.roll(xw, -r, 1)

    # Independence-MH chains over the window. Init: window offset 0.
    # All per-sweep randomness comes from two bulk draws: one
    # [num_sweeps, tile] block of acceptance bits and one [1, 128] row of
    # proposal-offset bits (scalar-extracted per sweep).
    w_cur = wwin_ref[slot, :, :tile]
    x_cur = xwin_ref[slot, :, :tile]
    a_off = jnp.zeros((1, tile), jnp.int32)
    # candidate slice offsets: 128 * [0, (wt-1)*tile/128]
    n_off = (wt - 1) * tile // 128 + 1
    ubits = pltpu.prng_random_bits((num_sweeps, tile))
    dbits = pltpu.prng_random_bits((1, 128))

    for sw in range(num_sweeps):
        db = 128 * jax.lax.rem(dbits[0, sw].astype(jnp.int32) & 0x7FFFFFFF,
                               jnp.int32(n_off))
        db = pl.multiple_of(db, 128)
        w_cand = wwin_ref[slot, :, pl.ds(db, tile)]
        u = _to_uniform(ubits[sw:sw + 1, :])
        # u * w_cur < w_cand  <=>  log u < lw_cand - lw_cur (w > 0).
        acc = u * w_cur < w_cand
        w_cur = jnp.where(acc, w_cand, w_cur)
        x_cur = jnp.where(acc, xwin_ref[slot, :, pl.ds(db, tile)], x_cur)
        a_off = jnp.where(acc, jnp.full((1, tile), db, jnp.int32), a_off)

    # Global ancestor: rotated window pos q maps to pre-roll window pos
    # (q + r) mod (wt*tile); positions in the first (contiguous) pair
    # map to ws + pos, the extra third tile to its own base ws2.
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
    pos = a_off + lane + r.astype(jnp.int32)
    pos = jnp.where(pos >= wt * tile, pos - wt * tile, pos)
    if wt == 2:
        a_ref[:, :] = jax.lax.rem(ws + pos, jnp.int32(n))
    else:
        ws2 = half_of(i, 2)
        in_pair = pos < 2 * tile
        a_pair = jax.lax.rem(ws + pos, jnp.int32(n))
        a_extra = jax.lax.rem(ws2 + (pos - 2 * tile), jnp.int32(n))
        a_ref[:, :] = jnp.where(in_pair, a_pair, a_extra)

    # In-kernel MXU matmuls (beat unrolled FMAs at every d). Precision
    # mirrors the XLA packed path (ops/packed.matvec, default-precision
    # jnp.matmul): XLA lowers tiny-d f32 matvecs exactly, so small d uses
    # HIGHEST (multi-pass f32-exact, cost nil — without it the zero-noise
    # parity check in validate_fused_tpu drifts ~1e-3); at larger d XLA
    # itself runs single-pass bf16 MXU, and HIGHEST's 3-6 extra passes
    # cost ~25% of the d>=32 step, so DEFAULT matches both the XLA
    # path's accuracy and the perf design point. bf16 state (mixed
    # precision) always runs the MXU's native bf16xbf16->f32 mode.
    sdt = xwin_ref.dtype
    prec = (jax.lax.Precision.HIGHEST
            if max(d, k) <= 8 and sdt == jnp.float32
            else jax.lax.Precision.DEFAULT)

    def matvec(A_ref, Xv):
        return jax.lax.dot_general(
            A_ref[...], Xv.astype(A_ref.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)

    # Propagate: mean = G @ x_anc; noise = Q @ z (MVT: scaled by the
    # chi-square mixture sqrt(df/g), one g per particle). Bulk bit draws
    # again: one [2d, tile] call for the Box-Muller pairs, one
    # [3 * rounds, tile] call for the gamma sampler. Under mixed
    # precision the state/matrix operands are bf16 (accumulating f32,
    # like the XLA path); the noise, mixture scale, and likelihood stay
    # f32.
    mean = matvec(G_ref, x_cur)
    zbits = pltpu.prng_random_bits((2 * d, tile))
    z = _to_normals(zbits[:d], zbits[d:])
    qz = matvec(Q_ref, z)
    df = mp_ref[0]
    if noise == "mvt":
        if df_int is not None:
            # EXACT chi-square for integer df: chi2_{2m+r} =
            # -2 log(prod_{i<m} U_i) + r * z^2 — ONE log instead of
            # Marsaglia-Tsang's 8 transcendental passes; the same trick
            # as the XLA path (ops/random.chi2_integer_df), where the
            # gamma draw was ~70% of the whole MVT filter step. m == 0
            # (df_int == 1) skips the product term entirely, like
            # chi2_integer_df; the Box-Muller rows start AT row m so
            # they never alias the product rows.
            m, odd = divmod(df_int, 2)
            cbits = pltpu.prng_random_bits((m + 2 * odd, tile))
            if m > 0:
                prod = _to_uniform(cbits[0:1])
                for j in range(1, m):
                    prod = prod * _to_uniform(cbits[j:j + 1])
                g = -2.0 * jnp.log(jnp.maximum(prod, 1e-38))
            else:
                g = jnp.zeros((1, tile), jnp.float32)
            if odd:
                zc = _to_normals(cbits[m:m + 1], cbits[m + 1:m + 2])
                g = g + zc * zc
        else:
            gbits = pltpu.prng_random_bits((3 * _MT_ROUNDS, tile))
            g = 2.0 * _mt_gamma(0.5 * df, gbits)
        qz = qz * jnp.sqrt(df / g)
    x_new = (mean + qz).astype(sdt)
    xo_ref[:, :] = x_new

    # Reweight: resid = y - F @ x_new; quad = |Li resid|^2. Computed
    # from the STORED (possibly bf16) state for parity with the XLA
    # path, which reweights the bf16 carry.
    fx = matvec(F_ref, x_new)
    resid = y_ref[...] - fx
    zz = matvec(Li_ref, resid)
    quad = jnp.sum(zz * zz, axis=0, keepdims=True)
    log_norm = mp_ref[1]
    if noise == "mvt":
        ll_ref[:, :] = log_norm - 0.5 * (df + k) * jnp.log1p(quad / df)
    else:
        ll_ref[:, :] = log_norm - 0.5 * quad


@functools.partial(
    jax.jit,
    static_argnames=("noise", "num_sweeps", "tile", "interpret", "df_int",
                     "num_window_tiles"))
def fused_filter_step(key, X, logw, y_t, G, Q, F, Li, df, log_norm,
                      *, noise: str = "mvn", num_sweeps: int = 10,
                      tile: int = DEFAULT_TILE, interpret: bool = False,
                      df_int: int = None, num_window_tiles: int = 2):
    """One fused filter step on packed particles.

    X [d, N] (N divisible by ``tile``), logw [N]; returns
    (X_new [d, N], loglik [N], ancestors [N] int32). ``df_int`` (static)
    selects the exact one-log integer-df chi-square for the MVT mixture;
    None falls back to the fixed-round Marsaglia-Tsang gamma.
    ``num_window_tiles=3`` widens the proposal window with one extra
    tile at an independent random offset (1.5x window DMA, candidates
    from two separated regions per step — the windowed-bias-reduction
    experiment; 2 is the round-3 behavior).
    """
    d, n = X.shape
    k = F.shape[0]
    if n % tile != 0:
        raise ValueError(f"N={n} not divisible by tile={tile}")
    if tile % 128 != 0:
        # ws = i*tile + s must be lane-aligned; pl.multiple_of is an
        # UNCHECKED promise to Mosaic, so enforce it here.
        raise ValueError(f"tile={tile} must be a multiple of 128")
    if max(d, k) > MAX_MXU_DIM:
        raise ValueError(f"fused step supports d,k <= {MAX_MXU_DIM}")
    if X.dtype == jnp.bfloat16 and d % 2:
        # The bf16 window rotation runs on the int32 sublane-pair view.
        raise ValueError("bfloat16 state needs even d")
    if num_sweeps > 128:
        # The per-sweep proposal offsets come from ONE [1, 128] bulk bit
        # draw indexed at [0, sw]; more sweeps would index out of bounds
        # in-kernel (and B > 128 independence-MH sweeps is far past the
        # mixing point anyway).
        raise ValueError(f"num_sweeps={num_sweeps} exceeds the kernel's "
                         f"128-sweep proposal-bit budget")
    if df_int is not None and not 1 <= df_int <= MAX_INTEGER_DF:
        # Large df would underflow the f32 uniform product to its clamp,
        # silently biasing the chi-square (ops/random.chi2_integer_df
        # enforces the same bound).
        raise ValueError(f"df_int={df_int} outside [1, {MAX_INTEGER_DF}]; "
                         f"pass df_int=None for the Marsaglia-Tsang path")

    # Mixed precision: the state window, transition/observation factors
    # and their MXU operands follow X.dtype (f32 or bf16); the weight
    # path (log-weights, V factors, observation, likelihood) stays f32.
    sdt = X.dtype
    G, Q, F = (jnp.asarray(a, sdt) for a in (G, Q, F))
    Li = jnp.asarray(Li, jnp.float32)
    y_t = jnp.asarray(y_t, jnp.float32).reshape(k, 1)
    logw = jnp.asarray(logw, jnp.float32)

    if num_window_tiles not in (2, 3):
        raise ValueError("num_window_tiles must be 2 or 3")
    if n < num_window_tiles * tile:
        raise ValueError(f"N={n} smaller than the {num_window_tiles}-tile "
                         f"window")
    k_s, k_seed = jax.random.split(key)
    # Coarse window offsets in TILE units (the kernel's window tiles are
    # tile-aligned source slices; see _step_kernel): s[0] places the
    # contiguous primary pair, s[1] the independent extra tile (used
    # only when num_window_tiles=3). Finer placement comes from the
    # in-kernel 128-aligned sweep offsets + lane rolls.
    s = jax.random.randint(k_s, (2,), 0, n // tile, jnp.int32)
    seed = jax.random.bits(k_seed, (2,), jnp.uint32).astype(jnp.int32)

    lw2 = logw[None, :]
    mp = jnp.stack([jnp.asarray(df if df is not None else 1.0,
                                jnp.float32),
                    jnp.asarray(log_norm, jnp.float32)])

    # Matrices are VMEM-resident, feeding the in-kernel MXU matmuls.
    mat_spec = pl.BlockSpec(memory_space=None)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # X
            pl.BlockSpec(memory_space=pl.ANY),   # logw
            mat_spec,                            # y [k, 1]
            mat_spec,                            # G
            mat_spec,                            # Q
            mat_spec,                            # F
            mat_spec,                            # Li
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (df, log_norm)
        ],
        out_specs=[
            pl.BlockSpec((d, tile), lambda i, *_: (0, i)),
            pl.BlockSpec((1, tile), lambda i, *_: (0, i)),
            pl.BlockSpec((1, tile), lambda i, *_: (0, i)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, d, num_window_tiles * tile), sdt),
            pltpu.VMEM((2, 1, num_window_tiles * tile), jnp.float32),
            pltpu.SemaphoreType.DMA((2, num_window_tiles, 2)),
        ],
    )
    kernel = functools.partial(
        _step_kernel, n=n, tile=tile, d=d, k=k,
        num_sweeps=num_sweeps, noise=noise, df_int=df_int,
        num_window_tiles=num_window_tiles)

    def build_and_call():
        call = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((d, n), sdt),
                jax.ShapeDtypeStruct((1, n), jnp.float32),
                jax.ShapeDtypeStruct((1, n), jnp.int32),
            ],
        )
        return call(s, seed, X, lw2, y_t, G, Q, F, Li, mp)

    # interpret=True emulates the TPU primitives (prng, DMA, rolls) on any
    # backend via force_tpu_interpret_mode — the flag is read when
    # pallas_call is CONSTRUCTED, so construction happens under the
    # context. (Plain pallas interpret mode lacks pltpu.prng_* on CPU.)
    if interpret:
        with pltpu.force_tpu_interpret_mode():
            x_new, ll, a = build_and_call()
    else:
        x_new, ll, a = build_and_call()
    return x_new, ll[0], a[0]
