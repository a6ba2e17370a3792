#!/usr/bin/env python
"""Grid-scale timing of the two-phase select-chain rank vs the current
bitwise two-gather search, same 1M-query workload, one pallas_call."""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cusmc_tpu.utils.timing import scan_slope

ROWS = 16
FOLD = 128
WINDOW = ROWS * FOLD
N = 1 << 20
NB = N // 1024  # 1024 blocks, 8 qrows each


def _kernel_new(cw_ref, p_ref, rank_ref):
    cw = cw_ref[0]            # [16, 128]
    p8 = p_ref[0]             # [8, 128]
    rm = jnp.take_along_axis(cw, jnp.full((ROWS, FOLD), FOLD - 1,
                                          jnp.int32), axis=1)
    rstar = jnp.zeros((8, FOLD), jnp.int32)
    for r in range(ROWS):
        rstar = rstar + (rm[r:r + 1, :] <= p8).astype(jnp.int32)
    rstar = jnp.minimum(rstar, ROWS - 1)
    masks = [rstar == r for r in range(ROWS)]
    rows = [jnp.broadcast_to(cw[r:r + 1, :], (8, FOLD)) for r in range(ROWS)]
    rlow = jnp.zeros((8, FOLD), jnp.int32)
    k = FOLD
    while k > 1:
        k //= 2
        gi = rlow + (k - 1)
        v = jnp.take_along_axis(rows[0], gi, axis=1)
        for r in range(1, ROWS):
            v = jnp.where(masks[r], jnp.take_along_axis(rows[r], gi, axis=1),
                          v)
        rlow = jnp.where(v <= p8, rlow + k, rlow)
    rank_ref[0] = rstar * FOLD + rlow


def _lookup8(table, w_idx):
    """current-style two-gather lookup, [8,128] table, [1,128] idx."""
    l = jnp.broadcast_to(w_idx & (FOLD - 1), (8, FOLD))
    s = jnp.broadcast_to(w_idx >> 7, (8, FOLD))
    h = jnp.take_along_axis(table, l, axis=1)
    return jnp.take_along_axis(h, s, axis=0)[0:1, :]


def _kernel_old(cw_ref, p_ref, rank_ref):
    cw = cw_ref[0][:8]        # [8, 128] (1024 window)
    for qr in range(8):
        p = p_ref[0, qr:qr + 1, :]
        r = jnp.zeros((1, FOLD), jnp.int32)
        k = 1024
        while k > 1:
            k //= 2
            cand = r + k
            gi = jnp.minimum(cand - 1, 1023)
            v = _lookup8(cw, gi)
            r = jnp.where((cand <= 1024) & (v <= p), cand, r)
        rank_ref[0, qr:qr + 1, :] = r


def run(kernel, name):
    rng = np.random.default_rng(0)
    vals = np.sort(rng.random(WINDOW).astype(np.float32))
    cw = jnp.broadcast_to(jnp.asarray(vals.reshape(ROWS, FOLD)),
                          (NB, ROWS, FOLD))
    p = jnp.asarray(rng.random((NB, 8, FOLD)).astype(np.float32))

    call = pl.pallas_call(
        kernel,
        grid=(NB,),
        in_specs=[pl.BlockSpec((1, ROWS, FOLD), lambda b: (b, 0, 0)),
                  pl.BlockSpec((1, 8, FOLD), lambda b: (b, 0, 0))],
        out_specs=pl.BlockSpec((1, 8, FOLD), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((NB, 8, FOLD), jnp.int32),
    )
    f = jax.jit(lambda pp: call(cw, pp))

    def mk(c, T):
        def body(c, i):
            return c + f(p + i * 1e-12).astype(jnp.float32).sum() * 1e-20, ()
        out, _ = jax.lax.scan(body, c, jnp.arange(T))
        return out

    t = scan_slope(mk, jnp.float32(0.0), steps=(4, 32), reps=3)
    print(f"{name}: {t*1e3:.3f} ms per 1M queries", flush=True)


def main():
    run(_kernel_new, "two-phase select-chain (window 2048)")
    run(_kernel_old, "bitwise two-gather (window 1024)")


if __name__ == "__main__":
    main()
