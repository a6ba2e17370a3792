#!/usr/bin/env python
"""Decompose the monotone-gather kernel cost at N=1M on-chip.

take_columns = grid + DMA + apply-lookups (no search);
inverse_cdf_apply = grid + 2xDMA + 10-round search + apply.
Varying d separates per-lookup cost from fixed per-block cost.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cusmc_tpu.ops.monotone_gather import take_columns, inverse_cdf_apply
from cusmc_tpu.resampling.classic import systematic_positions
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
    logw = jax.random.normal(key, (N,), jnp.float32)
    cdf = jnp.cumsum(jax.nn.softmax(logw))
    pos = systematic_positions(key, N, jnp.float32)
    # mildly compressed sorted ancestors: per-block span < window always
    a = (jnp.arange(N, dtype=jnp.float32) * 0.9).astype(jnp.int32)
    # NOTE (round-2 advisor): the index expression must depend on the
    # scan counter i in a non-constant-foldable way, or XLA hoists the
    # gather indices (and the runtime monotonicity check) out of the
    # scan body and the probe understates real filter steps. i %% 2
    # preserves monotonicity and keeps the index pipeline in the loop.

    for d in (2, 8, 16):
        X = jax.random.normal(key, (d, N), jnp.float32)

        def tc(c, i, d=d):
            return take_columns(c, jnp.minimum(a + (i % 2), N - 1))

        slope(f"take_columns d={d} tile=512", tc, X)

    for tile in (512, 1024):
        X = jax.random.normal(key, (2, N), jnp.float32)

        def tc2(c, i, tile=tile):
            return take_columns(c, jnp.minimum(a + (i % 2), N - 1), tile=tile)

        slope(f"take_columns d=2 tile={tile}", tc2, X)

    X = jax.random.normal(key, (2, N), jnp.float32)

    def fused(c, i):
        y, _ = inverse_cdf_apply(cdf, pos + i * 1e-12, c)
        return y

    slope("inverse_cdf_apply d=2 tile=512", fused, X)


if __name__ == "__main__":
    main()
