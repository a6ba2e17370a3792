#!/usr/bin/env python
"""One-off on-chip probes for the monotone-gather (CDF resampler apply)
kernel design: measures the XLA primitives the round-1 systematic path is
built from, and tests whether Mosaic lowers an in-kernel dynamic lane
gather (``jnp.take_along_axis`` on the minor axis) — the deciding fact for
the kernel's within-block apply strategy.

Findings recorded in benchmarks/RESULTS.md.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cusmc_tpu.utils.timing import scan_slope

N = 1 << 20


def per_op(op, x, steps=(4, 16)):
    """Per-call seconds of op via scan slope (dispatch-latency free)."""

    def mk(carry, T):
        def body(c, i):
            return op(c, i), ()

        c, _ = jax.lax.scan(body, carry, jnp.arange(T)), None
        return c

    return scan_slope(mk, x, steps=steps)


def main():
    print("jax", jax.__version__, jax.devices())

    key = jax.random.key(0)
    v2m = jax.random.uniform(key, (2 * N,), jnp.float32)
    v1m = jax.random.uniform(key, (N,), jnp.float32)

    # --- argsort 2M ---
    t = per_op(lambda c, i: jnp.argsort(c + i * 1e-9).astype(jnp.float32),
               v2m)
    print(f"argsort 2M f32: {t*1e3:.3f} ms")

    # --- sort 2M (values only) ---
    t = per_op(lambda c, i: jnp.sort(c + i * 1e-9), v2m)
    print(f"sort 2M f32:    {t*1e3:.3f} ms")

    # --- cumsum 1M ---
    t = per_op(lambda c, i: jnp.cumsum(c + i * 1e-9), v1m)
    print(f"cumsum 1M f32:  {t*1e3:.3f} ms")

    # --- sorted take [d, N] d=2 ---
    a_sorted = jnp.sort(jax.random.randint(key, (N,), 0, N, jnp.int32))
    X2 = jax.random.normal(key, (2, N), jnp.float32)

    def take_op(c, i):
        return jnp.take(c, a_sorted, axis=1) + i * 1e-9

    t = per_op(take_op, X2)
    print(f"take [2,1M] sorted idx: {t*1e3:.3f} ms")

    # --- searchsorted: 2048 queries into 1M cdf ---
    cdf = jnp.cumsum(jax.nn.softmax(v1m))
    q = jnp.linspace(0.0, 1.0, 2048)

    def ss_op(c, i):
        r = jnp.searchsorted(c, q + i * 1e-12)
        return c + r.sum() * 1e-20, None

    def mk(carry, T):
        def body(c, i):
            c, _ = ss_op(c, i)
            return c, ()
        c, _ = jax.lax.scan(body, carry, jnp.arange(T))
        return c

    t = scan_slope(mk, cdf)
    print(f"searchsorted 2048q/1M: {t*1e3:.3f} ms")

    # --- Pallas: in-kernel dynamic lane gather ---
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D, T_, W = 8, 512, 1024

    def gather_kernel(x_ref, idx_ref, o_ref):
        idx = idx_ref[:, :]                       # [1, T]
        rel = jnp.broadcast_to(idx, (D, T_))
        o_ref[:, :] = jnp.take_along_axis(x_ref[:, :], rel, axis=1)

    @jax.jit
    def pallas_gather(x, idx):
        return pl.pallas_call(
            gather_kernel,
            out_shape=jax.ShapeDtypeStruct((D, T_), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx)

    xw = jax.random.normal(key, (D, W), jnp.float32)
    idx = jnp.sort(jax.random.randint(key, (1, T_), 0, W, jnp.int32), axis=1)
    try:
        out = pallas_gather(xw, idx)
        ref = jnp.take_along_axis(xw, jnp.broadcast_to(idx, (D, T_)), axis=1)
        ok = bool(jnp.allclose(out, ref))
        print(f"pallas in-kernel take_along_axis(minor): LOWERS ok={ok}")
    except Exception as e:
        print(f"pallas in-kernel take_along_axis(minor): FAILS "
              f"({type(e).__name__}: {str(e)[:200]})")

    # --- Pallas: full-size gather kernel throughput (grid over blocks) ---
    # Only run if lowering works.
    def blk_kernel(sstart_ref, a_ref, x_any, o_ref, win_ref, sem, *, d, tile,
                   wwin, n):
        b = pl.program_id(0)
        s = sstart_ref[b]
        cp = pltpu.make_async_copy(x_any.at[:, pl.ds(s, wwin)], win_ref, sem)
        cp.start()
        cp.wait()
        rel = a_ref[:, :] - s
        relb = jnp.broadcast_to(rel, (d, tile))
        o_ref[:, :] = jnp.take_along_axis(win_ref[:, :], relb, axis=1)

    def pallas_take_columns(X, a, tile=512, wwin=1024):
        d, n = X.shape
        nb = n // tile
        starts = a[::tile]
        starts = jnp.clip(starts & ~jnp.int32(127), 0, n - wwin)
        a2 = a.reshape(1, n)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, tile), lambda b, *_: (0, b)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((d, tile), lambda b, *_: (0, b)),
            scratch_shapes=[pltpu.VMEM((d, wwin), jnp.float32),
                            pltpu.SemaphoreType.DMA(())],
        )
        return pl.pallas_call(
            functools.partial(blk_kernel, d=d, tile=tile, wwin=wwin, n=n),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((d, n), jnp.float32),
        )(starts, a2, X)

    for d in (2, 8, 16):
        Xd = jax.random.normal(key, (d, N), jnp.float32)
        # near-uniform ancestors (healthy resampling regime)
        try:
            fn = jax.jit(lambda X, a: pallas_take_columns(X, a))
            out = fn(Xd, a_sorted)
            ref = jnp.take(Xd, a_sorted, axis=1)
            # window overflow possible at random sorted idx; just measure
            def op(c, i):
                return fn(c, a_sorted) + i * 1e-9
            t = per_op(op, Xd)
            err = float(jnp.max(jnp.abs(out - ref)))
            print(f"pallas take_columns d={d}: {t*1e3:.3f} ms  maxerr={err}")
        except Exception as e:
            print(f"pallas take_columns d={d}: FAILS "
                  f"({type(e).__name__}: {str(e)[:300]})")

    # --- one-hot matmul block cost, d=2 vs d=128 (MXU padding question) ---
    W_, T2 = 1024, 512

    def onehot_apply(win, rel):
        # win [d, W], rel [T]
        oh = (jax.lax.broadcasted_iota(jnp.int32, (W_, T2), 0)
              == rel[None, :]).astype(win.dtype)
        return win @ oh

    for d in (2, 128):
        win = jax.random.normal(key, (d, W_), jnp.float32)
        rel = jnp.sort(jax.random.randint(key, (T2,), 0, W_, jnp.int32))
        nb = N // T2

        def mk(carry, T):
            def body(c, i):
                # nb blocks worth of matmul per "step"
                def inner(cc, j):
                    return cc + onehot_apply(win + cc[:, :1] * 0, rel).sum(), ()
                s, _ = jax.lax.scan(
                    lambda cc, j: (cc * 0.999999
                                   + onehot_apply(win * (1 + j * 1e-12),
                                                  rel).sum(), ()),
                    c, jnp.arange(nb))
                return s, ()
            c, _ = jax.lax.scan(body, carry, jnp.arange(T))
            return c

        t = scan_slope(mk, jnp.float32(0.0), steps=(1, 3))
        print(f"onehot matmul d={d} x{nb} blocks: {t*1e3:.3f} ms "
              f"({t/nb*1e6:.2f} us/block)")


if __name__ == "__main__":
    main()
