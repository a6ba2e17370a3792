#!/usr/bin/env python
"""Stage decomposition for the multi-chain MH step (BASELINE config 5 shape).

Variants, all timed in ONE process (same-session comparability per
CLAUDE.md): the production sampler (tri_solve logpdf, threefry key), the
same with a precomputed inverse-Cholesky matmul logpdf, rbg keys, both,
and ablations that isolate RNG and logpdf cost.

Prints one JSON line per variant: chain-steps/s.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from cusmc_tpu.distributions import mvt_logpdf_cov
from cusmc_tpu.mcmc import metropolis_hastings_sampler

# 'inv' variants use the production closure (make_mvt_logprob)

CHAINS = int(os.environ.get("MH_CHAINS", 1024))
D = int(os.environ.get("MH_D", 128))
STEPS = int(os.environ.get("MH_STEPS", 2000))
DF = 8.0


def run_bf16_noise(tag, key_impl):
    """RW-MH with bf16 proposal noise (exact: symmetric increment stays
    symmetric under round-to-nearest, so the MH ratio is unchanged)."""
    mean = jnp.zeros(D, jnp.float32)
    cov = jnp.eye(D, dtype=jnp.float32)
    from cusmc_tpu.distributions import make_mvt_logprob
    lp = make_mvt_logprob(mean, cov, jnp.float32(DF))
    key = jax.random.key(0, impl=key_impl)
    init = jax.random.normal(jax.random.key(1), (CHAINS, D), jnp.float32)
    step0 = jnp.log(jnp.float32(2.38 / np.sqrt(D)))

    def body(carry, t):
        x, logp, log_step, acc_n = carry
        kt = jax.random.fold_in(key, t)
        kz, ku = jax.random.split(kt)
        z = jax.random.normal(kz, (CHAINS, D), jnp.bfloat16)
        x_prop = x + jnp.exp(log_step) * z.astype(jnp.float32)
        logp_prop = lp(x_prop)
        log_u = jnp.log(jax.random.uniform(ku, (CHAINS,), jnp.float32))
        accept = log_u < (logp_prop - logp)
        x = jnp.where(accept[:, None], x_prop, x)
        logp = jnp.where(accept, logp_prop, logp)
        pooled = jnp.mean(accept.astype(jnp.float32))
        adapt = jnp.where(t < STEPS // 2, 0.05, 0.0)
        log_step = log_step + adapt * (pooled - 0.234)
        return (x, logp, log_step, acc_n + pooled), ()

    def sampler(k):
        del k
        logp0 = lp(init)
        carry, _ = lax.scan(body, (init, logp0, step0, jnp.float32(0.0)),
                            jnp.arange(STEPS))
        return carry[3] / STEPS

    fn = jax.jit(sampler)
    _ = np.asarray(fn(key))
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        acc = np.asarray(fn(key))
        best = min(best, time.perf_counter() - t0)
    rate = CHAINS * STEPS / best
    print(json.dumps({"variant": tag, "chain_steps_per_s": round(rate),
                      "us_per_step": round(best / STEPS * 1e6, 2),
                      "accept": round(float(acc), 3)}), flush=True)
    return rate


def run(tag, key_impl, logprob_kind):
    cov = jnp.eye(D, dtype=jnp.float32)
    mean = jnp.zeros(D, jnp.float32)
    df = jnp.float32(DF)
    if logprob_kind == "inv":
        from cusmc_tpu.distributions import make_mvt_logprob
        log_prob = make_mvt_logprob(mean, cov, df)
    elif logprob_kind == "trisolve":
        log_prob = lambda x: mvt_logpdf_cov(x, mean, cov, df)
    elif logprob_kind == "cheap":  # ablation: no solve at all
        log_prob = lambda x: -0.5 * jnp.sum(x * x, axis=-1)
    key = jax.random.key(0, impl=key_impl)
    init = jax.random.normal(jax.random.key(1), (CHAINS, D), jnp.float32)

    fn = jax.jit(lambda k: metropolis_hastings_sampler(
        k, log_prob, init, STEPS, step_size=2.38 / np.sqrt(D),
        adapt_rate=0.05, keep_samples=False))
    out = fn(key)
    _ = np.asarray(out.accept_rate)
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        out = fn(jax.random.fold_in(key, i))
        _ = np.asarray(out.accept_rate)
        best = min(best, time.perf_counter() - t0)
    rate = CHAINS * STEPS / best
    print(json.dumps({"variant": tag, "chain_steps_per_s": round(rate),
                      "us_per_step": round(best / STEPS * 1e6, 2),
                      "accept": round(float(out.accept_rate), 3)}),
          flush=True)
    return rate


if __name__ == "__main__":
    want = os.environ.get("MH_VARIANTS", "").split(",") if \
        os.environ.get("MH_VARIANTS") else None
    for tag, impl, kind in [
        ("prod_threefry_trisolve", "threefry2x32", "trisolve"),
        ("inv_threefry", "threefry2x32", "inv"),
        ("inv_rbg", "rbg", "inv"),
        ("prod_rbg_trisolve", "rbg", "trisolve"),
        ("cheap_threefry", "threefry2x32", "cheap"),
        ("cheap_rbg", "rbg", "cheap"),
    ]:
        if want and tag not in want:
            continue
        run(tag, impl, kind)
    if not want or "bf16noise_rbg" in want:
        run_bf16_noise("bf16noise_rbg", "rbg")
