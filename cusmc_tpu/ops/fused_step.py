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

Supports d <= 8 (matrices unrolled from SMEM scalars); larger d uses the
XLA packed path (cusmc_tpu/smc/particle_filter.py) which is MXU-bound
anyway. Validated against the XLA path in tests/test_fused_step.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 2048
MAX_UNROLL_DIM = 8
_MT_ROUNDS = 4  # Marsaglia-Tsang proposal rounds (see ops/random.py)


def _uniform_from_bits(shape, dtype=jnp.float32):
    """U(0,1) from hardware PRNG bits; strictly positive for safe log().

    Bits arrive as int32 and Mosaic lacks a uint32->f32 cast, so keep the
    low 23 bits (always non-negative as int32) for the mantissa.
    """
    bits = pltpu.prng_random_bits(shape)
    u = (bits & 0x007FFFFF).astype(dtype) * (1.0 / (1 << 23))
    return jnp.maximum(u, 1e-12)


def _normals_from_bits(shape, dtype=jnp.float32):
    """Box-Muller normals from two uniform draws."""
    u1 = _uniform_from_bits(shape, dtype)
    u2 = _uniform_from_bits(shape, dtype)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(2.0 * math.pi * u2)


def _mt_gamma(alpha, shape, dtype=jnp.float32):
    """Fixed-round Marsaglia-Tsang Gamma(alpha) for (traced) alpha >= 1,
    from hardware PRNG — ops/random.py's sampler, in-kernel."""
    d = alpha - 1.0 / 3.0
    c = 1.0 / jnp.sqrt(9.0 * d)
    accepted = jnp.zeros(shape, jnp.bool_)
    out = jnp.broadcast_to(alpha.astype(dtype), shape)
    for _ in range(_MT_ROUNDS):
        x = _normals_from_bits(shape, dtype)
        v = (1.0 + c * x) ** 3
        u = _uniform_from_bits(shape, dtype)
        ok = (v > 0.0) & (jnp.log(u) < 0.5 * x * x + d - d * v
                          + d * jnp.log(jnp.where(v > 0.0, v, 1.0)))
        take = ok & ~accepted
        out = jnp.where(take, d.astype(dtype) * v, out)
        accepted |= ok
    return out


def _matvec_smem(A_ref, X, m: int, d: int):
    """[m, d] (SMEM scalars) @ [d, T] -> [m, T], fully unrolled VPU FMAs."""
    return jnp.stack([
        sum(A_ref[j, kk] * X[kk] for kk in range(d)) for j in range(m)
    ])


def _step_kernel(
    # scalar prefetch
    s_ref,        # [1] int32: global window offset for this step
    seed_ref,     # [2] int32: PRNG seed material (step-dependent)
    # tensor/scalar inputs
    xw_ref,       # [d, N + 2*tile] extended particles (ANY/HBM)
    lw_ref,       # [1, N + 2*tile] extended log-weights (ANY/HBM)
    y_ref,        # [k] observation (SMEM)
    G_ref,        # [d, d] (SMEM)
    Q_ref,        # [d, d] transition cov sqrt (SMEM)
    F_ref,        # [k, d] (SMEM)
    Li_ref,       # [k, k] inverse obs Cholesky (SMEM)
    mp_ref,       # [2] float32: (df, obs log-norm) (SMEM)
    # outputs
    xo_ref,       # [d, tile]
    ll_ref,       # [1, tile]
    a_ref,        # [1, tile] int32 global ancestor indices
    # scratch
    xwin_ref,     # [d, 2*tile] VMEM candidate window
    lwin_ref,     # [1, 2*tile] VMEM
    sem,          # DMA semaphores (2,)
    *,
    n: int, tile: int, d: int, k: int, num_sweeps: int, noise: str,
):
    i = pl.program_id(0)
    # Mix the tile id multiplicatively (golden-ratio hash, wrapped to
    # int32): adjacent raw seeds can yield correlated streams, which would
    # correlate resampling across tiles and inflate estimator variance.
    golden = jnp.int32(-1640531527)  # 0x9E3779B9 as int32
    pltpu.prng_seed(seed_ref[0], seed_ref[1] ^ (i * golden))

    # Window start: 128-aligned (s is pre-quantized by the caller; DMA and
    # VMEM slicing require lane-multiple offsets). Fine offsets come from
    # dynamic lane rotations below.
    ws = jax.lax.rem(jnp.int32(i * tile) + s_ref[0], jnp.int32(n))
    ws = pl.multiple_of(ws, 128)

    cp_x = pltpu.make_async_copy(
        xw_ref.at[:, pl.ds(ws, 2 * tile)], xwin_ref, sem.at[0])
    cp_w = pltpu.make_async_copy(
        lw_ref.at[:, pl.ds(ws, 2 * tile)], lwin_ref, sem.at[1])
    cp_x.start()
    cp_w.start()
    cp_w.wait()
    cp_x.wait()

    # One fine lane rotation r in [0, 128) per step de-aligns the lane
    # classes (after it, per-sweep slices can be 128-aligned — Mosaic
    # requires aligned vector loads — without restricting ancestry to
    # fixed lane residues across steps).
    r = pltpu.prng_random_bits((1, 1))[0, 0] & 127
    lwin_ref[:, :] = pltpu.roll(lwin_ref[:, :], -r, 1)
    xwin_ref[:, :] = pltpu.roll(xwin_ref[:, :], -r, 1)

    # Independence-MH chains over the window. Init: window offset 0.
    lw_cur = lwin_ref[:, :tile]
    x_cur = xwin_ref[:, :tile]
    a_off = jnp.zeros((1, tile), jnp.int32)
    n_off = tile // 128 + 1  # candidate slice offsets: 128 * [0, tile/128]

    for _ in range(num_sweeps):
        db_bits = pltpu.prng_random_bits((1, 1))
        db = 128 * jax.lax.rem(db_bits[0, 0].astype(jnp.int32) & 0x7FFFFFFF,
                               jnp.int32(n_off))
        db = pl.multiple_of(db, 128)
        lw_cand = lwin_ref[:, pl.ds(db, tile)]
        log_u = jnp.log(_uniform_from_bits((1, tile)))
        acc = log_u < (lw_cand - lw_cur)
        lw_cur = jnp.where(acc, lw_cand, lw_cur)
        x_cur = jnp.where(acc, xwin_ref[:, pl.ds(db, tile)], x_cur)
        a_off = jnp.where(acc, jnp.full((1, tile), db, jnp.int32), a_off)

    # Global ancestor: rotated window pos q maps to window pos
    # (q + r) mod 2*tile, i.e. global ((ws + q + r) mod n ... with window
    # wrap folded in first).
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
    pos = a_off + lane + r.astype(jnp.int32)
    pos = jnp.where(pos >= 2 * tile, pos - 2 * tile, pos)
    a_ref[:, :] = jax.lax.rem(ws + pos, jnp.int32(n))

    # Propagate: mean = G @ x_anc; noise = Q @ z (MVT: scaled by the
    # chi-square mixture sqrt(df/g), one g per particle).
    mean = _matvec_smem(G_ref, x_cur, d, d)
    z = _normals_from_bits((d, tile))
    qz = _matvec_smem(Q_ref, z, d, d)
    df = mp_ref[0]
    if noise == "mvt":
        g = 2.0 * _mt_gamma(0.5 * df, (1, tile))
        qz = qz * jnp.sqrt(df / g)
    x_new = mean + qz
    xo_ref[:, :] = x_new

    # Reweight: resid = y - F @ x_new; quad = |Li resid|^2.
    fx = _matvec_smem(F_ref, x_new, k, d)
    resid = jnp.stack([y_ref[j] - fx[j] for j in range(k)])
    zz = _matvec_smem(Li_ref, resid, k, k)
    quad = sum(zz[j] * zz[j] for j in range(k))[None, :]
    log_norm = mp_ref[1]
    if noise == "mvt":
        ll_ref[:, :] = log_norm - 0.5 * (df + k) * jnp.log1p(quad / df)
    else:
        ll_ref[:, :] = log_norm - 0.5 * quad


@functools.partial(
    jax.jit,
    static_argnames=("noise", "num_sweeps", "tile", "interpret"))
def fused_filter_step(key, X, logw, y_t, G, Q, F, Li, df, log_norm,
                      *, noise: str = "mvn", num_sweeps: int = 10,
                      tile: int = DEFAULT_TILE, interpret: bool = False):
    """One fused filter step on packed particles.

    X [d, N] (N divisible by ``tile``), logw [N]; returns
    (X_new [d, N], loglik [N], ancestors [N] int32).
    """
    d, n = X.shape
    k = F.shape[0]
    if n % tile != 0:
        raise ValueError(f"N={n} not divisible by tile={tile}")
    if tile % 128 != 0:
        # ws = i*tile + s must be lane-aligned; pl.multiple_of is an
        # UNCHECKED promise to Mosaic, so enforce it here.
        raise ValueError(f"tile={tile} must be a multiple of 128")
    if max(d, k) > MAX_UNROLL_DIM:
        raise ValueError(f"fused step supports d,k <= {MAX_UNROLL_DIM}")

    dtype = X.dtype
    G, Q, F, Li = (jnp.asarray(a, dtype) for a in (G, Q, F, Li))
    y_t = jnp.asarray(y_t, dtype)
    logw = jnp.asarray(logw, dtype)

    k_s, k_seed = jax.random.split(key)
    # 128-aligned global window offset (fine offsets via in-kernel rolls).
    s = 128 * jax.random.randint(k_s, (1,), 0, n // 128, jnp.int32)
    seed = jax.random.bits(k_seed, (2,), jnp.uint32).astype(jnp.int32)

    x_ext = jnp.concatenate([X, X[:, :2 * tile]], axis=1)
    lw_ext = jnp.concatenate([logw, logw[:2 * tile]])[None, :]
    mp = jnp.stack([jnp.asarray(df if df is not None else 1.0, X.dtype),
                    jnp.asarray(log_norm, X.dtype)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # x_ext
            pl.BlockSpec(memory_space=pl.ANY),   # lw_ext
            pl.BlockSpec(memory_space=pltpu.SMEM),  # y
            pl.BlockSpec(memory_space=pltpu.SMEM),  # G
            pl.BlockSpec(memory_space=pltpu.SMEM),  # Q
            pl.BlockSpec(memory_space=pltpu.SMEM),  # F
            pl.BlockSpec(memory_space=pltpu.SMEM),  # Li
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (df, log_norm)
        ],
        out_specs=[
            pl.BlockSpec((d, tile), lambda i, *_: (0, i)),
            pl.BlockSpec((1, tile), lambda i, *_: (0, i)),
            pl.BlockSpec((1, tile), lambda i, *_: (0, i)),
        ],
        scratch_shapes=[
            pltpu.VMEM((d, 2 * tile), jnp.float32),
            pltpu.VMEM((1, 2 * tile), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _step_kernel, n=n, tile=tile, d=d, k=k,
        num_sweeps=num_sweeps, noise=noise)

    def build_and_call():
        call = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((d, n), jnp.float32),
                jax.ShapeDtypeStruct((1, n), jnp.float32),
                jax.ShapeDtypeStruct((1, n), jnp.int32),
            ],
        )
        return call(s, seed, x_ext, lw_ext, y_t, G, Q, F, Li, mp)

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
