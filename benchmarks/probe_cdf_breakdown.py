#!/usr/bin/env python
"""Break down the systematic-resampler step cost at N=1M on-chip."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cusmc_tpu.diagnostics.metrics import effective_sample_size, log_normalize
from cusmc_tpu.ops.monotone_gather import inverse_cdf_apply
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
    X = jax.random.normal(key, (2, N), jnp.float32)
    pos = systematic_positions(key, N, jnp.float32)
    cdf = jnp.cumsum(jax.nn.softmax(logw))

    slope("softmax+cumsum [1M]",
          lambda c, i: jnp.cumsum(jax.nn.softmax(c + i * 1e-9)), logw)
    slope("cumsum only [1M]",
          lambda c, i: jnp.cumsum(c * (1 + i * 1e-12)), cdf)

    def fused(c, i):
        y, a = inverse_cdf_apply(cdf, pos + i * 1e-12, c)
        return y

    slope("inverse_cdf_apply (kernel+cond+coarse ss)", fused, X)

    def logpath(c, i):
        ess = effective_sample_size(c)
        lw, lz = log_normalize(c + i * 1e-9)
        return lw + ess * 1e-20 + lz * 1e-20

    slope("ESS + log_normalize [1M]", logpath, logw)

    q = jnp.linspace(0.0, 1.0, 2049)
    slope("searchsorted 2049q/1M",
          lambda c, i: c + jnp.searchsorted(cdf, q + i * 1e-12).sum() * 1e-20,
          jnp.float32(0.0))


if __name__ == "__main__":
    main()
