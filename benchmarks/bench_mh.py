#!/usr/bin/env python
"""Multi-chain MH benchmark — BASELINE config 5 shape: 1024 chains on a
d=128 MVT target with pooled acceptance-rate adaptation.

Prints one JSON line: chain-steps/sec/chip. Runs wherever the default
backend lives (real chip under this session env; pass a smaller shape via
env for CPU smoke: MH_CHAINS/MH_D/MH_STEPS).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cusmc_tpu.distributions import mvt_logpdf_cov
from cusmc_tpu.mcmc import metropolis_hastings_sampler


def main():
    chains = int(os.environ.get("MH_CHAINS", 1024))
    d = int(os.environ.get("MH_D", 128))
    steps = int(os.environ.get("MH_STEPS", 2000))
    df = 8.0

    cov = jnp.eye(d, dtype=jnp.float32)
    log_prob = lambda x: mvt_logpdf_cov(x, jnp.zeros(d, jnp.float32), cov, df)
    key = jax.random.key(0)
    init = jax.random.normal(key, (chains, d), jnp.float32)

    fn = jax.jit(lambda k: metropolis_hastings_sampler(
        k, log_prob, init, steps, step_size=2.38 / np.sqrt(d),
        adapt_rate=0.05, keep_samples=False))

    out = fn(key)
    _ = np.asarray(out.accept_rate)  # sync
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        out = fn(jax.random.fold_in(key, i))
        _ = np.asarray(out.accept_rate)
        best = min(best, time.perf_counter() - t0)

    rate = chains * steps / best
    print(json.dumps({
        "metric": f"chain-steps/sec/chip, RW-MH on d={d} MVT, "
                  f"{chains} chains, pooled adaptation",
        "value": rate,
        "unit": "chain-steps/s",
        "accept_rate": float(out.accept_rate),
        "step_size": float(out.step_size),
    }))


if __name__ == "__main__":
    main()
