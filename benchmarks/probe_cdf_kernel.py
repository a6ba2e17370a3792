#!/usr/bin/env python
"""Decompose the inverse_cdf_apply cost at N=1M: apply-only kernel
(take_columns) vs search+apply, tile sweep, and the coarse-rank
alternatives (full-cdf searchsorted vs 128-strided cdf searchsorted)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cusmc_tpu.ops.monotone_gather import inverse_cdf_apply, take_columns
from cusmc_tpu.resampling.classic import systematic_positions
from cusmc_tpu.utils.timing import scan_slope

N = 1 << 20
D = int(os.environ.get("PROBE_D", 2))


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
    kw, kp, kx = jax.random.split(key, 3)
    logw = jax.random.normal(kw, (N,), jnp.float32)
    cdf = jnp.cumsum(jax.nn.softmax(logw))
    X = jax.random.normal(kx, (D, N), jnp.float32)
    pos = systematic_positions(kp, N, jnp.float32)
    a = jnp.arange(N, dtype=jnp.int32)  # identity: monotone, in-window

    # Apply-only kernel: same grid/DMA structure, no binary search.
    for tile in (256, 512, 1024):
        slope(f"take_columns tile={tile}",
              lambda c, i, t=tile: take_columns(c, jnp.minimum(a + (i % 2),
                                                               N - 1),
                                                tile=t), X)

    for tile in (256, 512):
        slope(f"inverse_cdf_apply tile={tile}",
              lambda c, i, t=tile: inverse_cdf_apply(
                  cdf, pos + i * 1e-12, c, tile=t)[0], X)

    # Coarse-rank candidates (nb+1 queries at tile=512 -> 2049).
    q = jnp.linspace(0.0, 1.0, 2049)
    cdf128 = cdf[127::128]  # [8192]
    slope("strided slice cdf[127::128]",
          lambda c, i: (c + i * 1e-12)[127::128].sum() * 0 + c, cdf)
    slope("searchsorted cdf128[8192] 2049q",
          lambda c, i: c + jnp.searchsorted(cdf128, q + i * 1e-12
                                            ).sum() * 1e-20,
          jnp.float32(0.0))
    slope("cumsum+slice+ss128 combo",
          lambda c, i: jnp.searchsorted(
              jnp.cumsum(c + i * 1e-9)[127::128], q).sum() * 1e-20 + c,
          logw)


if __name__ == "__main__":
    main()
