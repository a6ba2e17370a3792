"""On-chip probe for the Metropolis sweep-cost lever (VERDICT round-3
item 6): throughput AND statistical quality as a function of the sweep
budget B, plus the ESS-conditioned "auto" truncation.

Part 1 (throughput): bench-config MVT filter (N=1M, d=2, T=200) at
B in {2, 3, 5, 10} and num_steps="auto".
Part 2 (quality): MVN demo model (exact Kalman logZ available), N=262144,
T=200, several seeds per config -> logZ bias vs the oracle per B.

Usage: python benchmarks/probe_sweeps.py
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
from cusmc_tpu.smc.particle_filter import bootstrap_filter
from cusmc_tpu.smc.kalman import kalman_filter


def measure(fn, key, reps=3):
    out = fn(key)
    jax.block_until_ready(out)
    best = float("inf")
    for i in range(reps):
        k = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        out = fn(k)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    n = int(os.environ.get("PROBE_N", 1_048_576))
    t = int(os.environ.get("PROBE_T", 200))
    key = jax.random.key(0, impl="rbg")

    params = demo_model_params(d=2)
    model = DLM.create(noise="mvt", df=5.0, dtype=jnp.float32, **params)
    _, ys = model.simulate(key, t)
    ys = jnp.asarray(ys, jnp.float32)

    print("== throughput (MVT, N=%d, T=%d, d=2) ==" % (n, t), flush=True)
    for b in (2, 3, 5, 10, "auto"):
        fn = jax.jit(lambda k, b=b: bootstrap_filter(
            k, model, ys, n, resampler="metropolis",
            resampler_kwargs={"num_steps": b}, return_history=False))
        dt, out = measure(fn, key)
        r = np.asarray(out.ess)[1:] / n
        print(f"B={b!s:>4}: {n*(t-1)/dt/1e6:8.1f} M p-s/s "
              f"({dt*1e3/(t-1):.3f} ms/step) logZ {float(out.log_evidence):.1f} "
              f"ess/N mean {r.mean():.3f} min {r.min():.3f}", flush=True)

    print("== quality vs Kalman (MVN, N=262144, T=200) ==", flush=True)
    n_q = 262144
    model_q = DLM.create(noise="mvn", dtype=jnp.float32, **params)
    _, ys_q = model_q.simulate(jax.random.fold_in(key, 99), t)
    ys_q = np.asarray(ys_q, np.float32)
    _, _, kll = kalman_filter(ys_q, **{k_: params[k_] for k_ in
                                       ("F", "G", "V", "W", "m0", "C0")})
    print(f"kalman logZ {float(kll):.2f}", flush=True)
    ys_qj = jnp.asarray(ys_q)
    for b in (2, 3, 5, 10, "auto"):
        fn = jax.jit(lambda k, b=b: bootstrap_filter(
            k, model_q, ys_qj, n_q, resampler="metropolis",
            resampler_kwargs={"num_steps": b},
            return_history=False).log_evidence)
        vals = []
        for s in range(5):
            vals.append(float(fn(jax.random.fold_in(key, 1000 + s))))
        vals = np.array(vals)
        print(f"B={b!s:>4}: logZ {vals.mean():.2f} +- {vals.std():.2f} "
              f"(bias {vals.mean() - float(kll):+.2f})", flush=True)


if __name__ == "__main__":
    main()
