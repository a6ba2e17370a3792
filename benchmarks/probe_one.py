"""Measure ONE filter config on the current backend and print one line.

Usage: python benchmarks/probe_one.py <tag> <key>=<val> ...
Keys: n, t, d, resampler, engine, tile (0=auto), sr, sweeps (int|auto),
      wtiles, sharded (0/1), noise, reps, seeds (quality mode: mean/sd
      of logZ over seeds vs Kalman for MVN).
Designed for the flaky-tunnel measurement loop (benchmarks/measure.sh):
single config per process so partial progress survives stalls.
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


def main():
    tag = sys.argv[1]
    kv = dict(a.split("=", 1) for a in sys.argv[2:])
    n = int(kv.get("n", 1_048_576))
    t = int(kv.get("t", 200))
    d = int(kv.get("d", 2))
    resampler = kv.get("resampler", "systematic")
    engine = kv.get("engine", "auto")
    tile = int(kv.get("tile", 0)) or None
    sr = int(kv.get("sr", 8))
    sweeps = kv.get("sweeps", "10")
    sweeps = sweeps if sweeps == "auto" else int(sweeps)
    wtiles = int(kv.get("wtiles", 2))
    noise = kv.get("noise", "mvt")
    reps = int(kv.get("reps", 3))
    seeds = int(kv.get("seeds", 0))

    key = jax.random.key(0, impl="rbg")
    params = demo_model_params(d=d)
    model = DLM.create(noise=noise, df=5.0 if noise == "mvt" else None,
                       dtype=jnp.float32, **params)
    _, ys = model.simulate(key, t)
    ys = jnp.asarray(ys, jnp.float32)
    rk = {"num_steps": sweeps, "sr": sr, "num_window_tiles": wtiles}

    if kv.get("sharded") == "1":
        from cusmc_tpu.parallel import make_mesh, sharded_bootstrap_filter

        mesh = make_mesh({"particles": len(jax.devices())})
        fn = jax.jit(lambda k: sharded_bootstrap_filter(
            k, model, ys, n, mesh, resampler=resampler,
            return_history=False))
    else:
        fn = jax.jit(lambda k: bootstrap_filter(
            k, model, ys, n, resampler=resampler, return_history=False,
            engine=engine, pallas_tile=tile, resampler_kwargs=rk))

    if seeds:
        from cusmc_tpu.smc.kalman import kalman_filter

        _, _, kll = kalman_filter(
            np.asarray(ys), **{k_: params[k_] for k_ in
                               ("F", "G", "V", "W", "m0", "C0")})
        vals = np.array([float(fn(jax.random.fold_in(key, 1000 + s))
                               .log_evidence) for s in range(seeds)])
        print(f"RESULT {tag} logZ {vals.mean():.2f} sd {vals.std():.2f} "
              f"kalman {float(kll):.2f} bias {vals.mean()-float(kll):+.2f}",
              flush=True)
        return

    out = fn(key)
    jax.block_until_ready(out)
    best = float("inf")
    for i in range(reps):
        k = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        out = fn(k)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    rate = n * (t - 1) / best
    print(f"RESULT {tag} {rate/1e6:.1f} Mps ({best*1e3/(t-1):.3f} ms/step) "
          f"logZ {float(out.log_evidence):.1f}", flush=True)


if __name__ == "__main__":
    main()
