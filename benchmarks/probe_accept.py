"""On-chip probe: cost of the Metropolis sweep acceptance uniforms.

Variants of the 10-sweep roll walk at the headline config:
  std   — one f32 uniform draw per sweep (shipping behavior)
  half  — one uint32 draw per TWO sweeps, 16-bit half-word uniforms
          (accept-probability quantization <= 2^-16, far below MC error)
  const — acceptance uniform replaced by a constant (statistically
          INVALID; lower-bounds the cost of draws)

Usage: python benchmarks/probe_accept.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cusmc_tpu.io.data import demo_model_params
from cusmc_tpu.models.dlm import DLM


def make_filter(variant, model, ys, n, num_steps=10):
    from cusmc_tpu.smc.particle_filter import (
        _fast_exp_step_factory,
        packed_exp_resample_op,
    )
    from cusmc_tpu.resampling.rolls import (
        apply_winning_rolls,
        winning_ancestors,
    )
    import math

    def weight_walk(key, w):
        nn = w.shape[-1]
        k_shift, k_u = jax.random.split(key)
        shifts = jax.random.randint(k_shift, (num_steps,), 0, nn,
                                    jnp.int32)
        if variant == "half":
            nd = (num_steps + 1) // 2
            bits = jax.random.bits(k_u, (nd, nn), jnp.uint32)
        w_cur = w
        b_win = jnp.full((nn,), -1, jnp.int32)
        for b in range(num_steps):
            w_cand = jnp.roll(w, -shifts[b])
            if variant == "std":
                u = jax.random.uniform(jax.random.fold_in(k_u, b), (nn,),
                                       w.dtype)
            elif variant == "half":
                half = bits[b // 2] >> (16 * (b % 2))
                u = ((half & jnp.uint32(0xFFFF)).astype(w.dtype)
                     + 0.5) * (1.0 / 65536.0)
            else:
                u = 0.5
            acc = u * w_cur < w_cand
            w_cur = jnp.where(acc, w_cand, w_cur)
            b_win = jnp.where(acc, b, b_win)
        return b_win, shifts

    def resample_exp(key, X, w):
        b_win, shifts = weight_walk(key, w)
        return (apply_winning_rolls(X, b_win, shifts),
                jnp.ones_like(w), winning_ancestors(b_win, shifts))

    step = _fast_exp_step_factory(
        model.propagate_packed, model.observation_logpdf_packed, n,
        resample_exp, None, None, return_history=False)

    def run(key):
        k_init, k_scan = jax.random.split(key)
        x0 = model.sample_initial_packed(k_init, n)
        w0 = jnp.ones((n,), jnp.float32)
        ts = jnp.arange(1, ys.shape[0])
        (_, _, _), (_, _, lzs) = jax.lax.scan(
            step, (x0, w0, k_scan), (ts, ys[1:]))
        return jnp.sum(lzs)

    return jax.jit(run)


def main():
    n = int(os.environ.get("PROBE_N", 1_048_576))
    t = int(os.environ.get("PROBE_T", 200))
    key = jax.random.key(0, impl="rbg")
    params = demo_model_params(d=2)
    model = DLM.create(noise="mvt", df=5.0, dtype=jnp.float32, **params)
    _, ys = model.simulate(key, t)
    ys = jnp.asarray(ys, jnp.float32)

    for variant in ("std", "half", "const"):
        fn = make_filter(variant, model, ys, n)
        lz = float(fn(key))
        best = float("inf")
        for i in range(3):
            k = jax.random.fold_in(key, i)
            t0 = time.perf_counter()
            out = fn(k)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        print(f"RESULT accept-{variant} {n*(t-1)/best/1e6:.1f} Mps "
              f"({best*1e3/(t-1):.3f} ms/step) logZ {lz:.1f}", flush=True)


if __name__ == "__main__":
    main()
