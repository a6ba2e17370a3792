#!/usr/bin/env python
"""Prototype: two-phase in-window rank via row-broadcast select chains.

Validates that Mosaic lowers (a) take_along_axis on a row-broadcast
[8,128] table with PER-SUBLANE-VARYING lane indices and (b) the row-max
phase, then times the pattern against the current bitwise search.
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 16
FOLD = 128
WINDOW = ROWS * FOLD  # 2048


def _kernel(cw_ref, p_ref, rank_ref):
    cw = cw_ref[...]          # [16, 128]
    p8 = p_ref[...]           # [8, 128]
    # Phase A: row of each query = #{r: rowmax_r <= p}.
    rm = jnp.take_along_axis(cw, jnp.full((ROWS, FOLD), FOLD - 1,
                                          jnp.int32), axis=1)
    rstar = jnp.zeros((8, FOLD), jnp.int32)
    for r in range(ROWS):
        rstar = rstar + (rm[r:r + 1, :] <= p8).astype(jnp.int32)
    rstar = jnp.minimum(rstar, ROWS - 1)
    # Row masks (loop-invariant for phase B).
    masks = [rstar == r for r in range(ROWS)]
    rows = [jnp.broadcast_to(cw[r:r + 1, :], (8, FOLD)) for r in range(ROWS)]
    # Phase B: 7-round bitwise search within the active row.
    rlow = jnp.zeros((8, FOLD), jnp.int32)
    k = FOLD
    while k > 1:
        k //= 2
        gi = rlow + (k - 1)
        v = rows[0]
        g0 = jnp.take_along_axis(rows[0], gi, axis=1)
        v = g0
        for r in range(1, ROWS):
            v = jnp.where(masks[r], jnp.take_along_axis(rows[r], gi, axis=1),
                          v)
        rlow = jnp.where(v <= p8, rlow + k, rlow)
    rank_ref[...] = rstar * FOLD + rlow


@functools.partial(jax.jit, static_argnames=("interpret",))
def rank2048(cw, p8, interpret=False):
    call = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((8, FOLD), jnp.int32),
        interpret=interpret,
    )
    return call(cw, p8)


def main():
    rng = np.random.default_rng(0)
    vals = np.sort(rng.random(WINDOW).astype(np.float32))
    cw = jnp.asarray(vals.reshape(ROWS, FOLD))
    q = rng.random((8, FOLD)).astype(np.float32)
    p8 = jnp.asarray(q)

    got = np.asarray(rank2048(cw, p8))
    want = np.searchsorted(vals, q.ravel(), side="right").reshape(8, FOLD)
    want = np.minimum(want, WINDOW - 1)
    # phase-A clip: rank 2048 -> 15*128 + 127
    print("mismatches:", int((got != want).sum()), flush=True)
    bad = np.argwhere(got != want)
    if len(bad):
        i, j = bad[0]
        print("first bad:", got[i, j], want[i, j], q[i, j])

    # timing: rank 1M queries' worth of work via scan
    from cusmc_tpu.utils.timing import scan_slope

    def mk(c, T):
        def f(c, i):
            return rank2048(cw, c + i * 1e-12).astype(jnp.float32) * 1e-9 + c, ()
        out, _ = jax.lax.scan(f, c, jnp.arange(T))
        return out

    t = scan_slope(mk, p8, steps=(64, 1024), reps=3)
    print(f"rank2048 per call (1024 queries): {t*1e6:.2f} us -> "
          f"{1e6 * t * (1 << 20) / 1024:.0f} us per 1M queries", flush=True)


if __name__ == "__main__":
    main()
