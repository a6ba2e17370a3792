"""Single-pass blocked prefix sum for the CDF-resampler weight pipeline.

``jnp.cumsum`` over [1M] f32 lowers to ~0.19 ms on v5e (multiple HBM
passes); the inclusive CDF is the only O(N) stage left in the exp-space
systematic filter path after the round-3 kernel work, so it gets its own
kernel: ONE read of ``w`` and one write of ``cdf`` (~10 us of traffic).

The TPU Pallas grid is sequential on a core, which makes a carry-based
single-pass scan natural (the CUDA equivalent would need a
decoupled-lookback or two-pass scheme): each grid step computes an
in-register block prefix (Hillis-Steele over lanes, then over sublanes)
and adds a running total kept in VMEM scratch across grid steps.

Also emits the 128-STRIDED cdf (``cdf[127::128]``) as a free byproduct —
the search kernel's coarse block-placement input
(``ops/monotone_gather.inverse_cdf_apply``), saving its strided-slice
pass.

Replaces the prefix-sum role of the reference's never-built systematic
resampler (the reference has only Metropolis, ``/root/reference/src/
samplers.cpp:7-36``; systematic is the BASELINE.md north-star extension).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FOLD = 128
# Fold rows per grid block. The grid is SEQUENTIAL on the running-total
# carry, so per-step latency (~0.6 us) times the step count is the real
# cost: 32 rows (4096-element blocks) measured 0.17 ms at N=1M — 17x the
# ~10 us of traffic — while 256 rows (32K blocks, 32 steps) is ~0.05 ms.
# The largest candidate that divides N wins; ineligible N falls back to
# jnp.cumsum in the caller.
BROWS_CANDIDATES = (256, 64, 32)
BLOCK_MIN = FOLD * BROWS_CANDIDATES[-1]


def _cumsum_kernel(w_ref, cdf_ref, s128_ref, carry, *, brows):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        carry[...] = jnp.zeros((1, FOLD), w_ref.dtype)

    x = w_ref[...]                          # [brows, FOLD]
    lane = jax.lax.broadcasted_iota(jnp.int32, (brows, FOLD), 1)
    k = 1
    while k < FOLD:
        x = x + jnp.where(lane >= k, jnp.roll(x, k, axis=1), 0.0)
        k *= 2
    # Row totals broadcast across lanes (one const-index gather).
    rt = jnp.take_along_axis(
        x, jnp.full((brows, FOLD), FOLD - 1, jnp.int32), axis=1)
    row = jax.lax.broadcasted_iota(jnp.int32, (brows, FOLD), 0)
    s = rt                                   # inclusive prefix of row totals
    k = 1
    while k < brows:
        s = s + jnp.where(row >= k, jnp.roll(s, k, axis=0), 0.0)
        k *= 2
    c = carry[...]                           # [1, FOLD], all lanes equal
    # (x - rt) is exactly 0 at lane FOLD-1, so out[:, -1] == fl(s + c)
    # bitwise — the same expression as the carry update, keeping the
    # strided output and the next block's base consistent.
    out = (x - rt) + (s + c)
    cdf_ref[...] = out
    s128_ref[...] = out[:, FOLD - 1:FOLD]    # row-end cdf values, exact
    carry[...] = s[brows - 1:brows, :] + c


def blocked_cumsum(w: jnp.ndarray, *, interpret: bool = False
                   ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Inclusive prefix sum of ``w`` [N] plus the 128-strided cdf.

    Returns ``(cdf [N], cdf128 [N/128])``; falls back to
    ``jnp.cumsum`` (with a strided slice) off-TPU or for ineligible
    shapes. Values match ``jnp.cumsum`` up to f32 summation-order
    rounding, and the output is monotone by construction.
    """
    (n,) = w.shape
    brows = next((r for r in BROWS_CANDIDATES if n % (FOLD * r) == 0),
                 None)
    eligible = (brows is not None
                and w.dtype == jnp.float32
                and (interpret or jax.default_backend() == "tpu"))
    if not eligible:
        cdf = jnp.cumsum(w)
        if n % FOLD == 0:
            return cdf, cdf[FOLD - 1::FOLD]
        return cdf, None

    nb = n // (FOLD * brows)
    wf = w.reshape(n // FOLD, FOLD)

    def build_and_call():
        call = pl.pallas_call(
            functools.partial(_cumsum_kernel, brows=brows),
            grid=(nb,),
            in_specs=[pl.BlockSpec((brows, FOLD), lambda b: (b, 0))],
            out_specs=[
                pl.BlockSpec((brows, FOLD), lambda b: (b, 0)),
                pl.BlockSpec((brows, 1), lambda b: (b, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n // FOLD, FOLD), w.dtype),
                jax.ShapeDtypeStruct((n // FOLD, 1), w.dtype),
            ],
            scratch_shapes=[pltpu.VMEM((1, FOLD), w.dtype)],
        )
        cdf, s128 = call(wf)
        return cdf.reshape(n), s128.reshape(n // FOLD)

    if interpret:
        with pltpu.force_tpu_interpret_mode():
            return build_and_call()
    return build_and_call()
