#!/usr/bin/env python
"""Cost of the remaining fast-CDF pipeline pieces at N=1M: XLA cumsum
variants and coarse-rank candidates (searchsorted vs merge-rank)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cusmc_tpu.utils.timing import scan_slope

N = 1 << 20


def slope(name, body, carry, steps=(16, 256)):
    def mk(c, T):
        def f(c, i):
            return body(c, i), ()
        out, _ = jax.lax.scan(f, c, jnp.arange(T))
        return out

    t = scan_slope(mk, carry, steps=steps, reps=3)
    print(f"{name}: {t*1e3:.3f} ms", flush=True)


def main():
    key = jax.random.key(0)
    w = jax.random.uniform(key, (N,), jnp.float32)
    cdf = jnp.cumsum(w)
    cdf128 = cdf[127::128]
    q = jnp.linspace(0.0, cdf[-1], 1025)

    slope("cumsum [1M]", lambda c, i: jnp.cumsum(c * (1 + i * 1e-12)), w)

    def cumsum2d(c, i):
        v = (c * (1 + i * 1e-12)).reshape(1024, 1024)
        rows = jnp.cumsum(v, axis=1)
        offs = jnp.concatenate([jnp.zeros((1,), c.dtype),
                                jnp.cumsum(rows[:, -1])[:-1]])
        return (rows + offs[:, None]).reshape(-1)

    slope("cumsum 2d-decomposed [1024x1024]", cumsum2d, w)

    slope("coarse searchsorted cdf128 1025q",
          lambda c, i: c + jnp.searchsorted(cdf128, q + i * 1e-12,
                                            side="right").sum() * 1e-20,
          jnp.float32(0.0))

    def merge_rank(c, i):
        m = jnp.concatenate([cdf128, q + i * 1e-12])
        order = jnp.argsort(m)
        rank = jnp.argsort(order)
        return c + (rank[cdf128.shape[0]:]
                    - jnp.arange(1025)).sum() * 1e-20

    slope("coarse merge-rank [8192+1025]", merge_rank, jnp.float32(0.0))

    # max + exp + sums (the exp-space weight refresh)
    ll = jax.random.normal(key, (N,), jnp.float32)
    def wref(c, i):
        l2 = c + i * 1e-9
        m = jnp.max(l2)
        w2 = jnp.exp(l2 - m)
        return l2 + (jnp.sum(w2) + jnp.sum(w2 * w2)) * 1e-20
    slope("max+exp+2sums [1M]", wref, ll)


if __name__ == "__main__":
    main()
