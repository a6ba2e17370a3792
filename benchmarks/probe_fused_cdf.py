"""On-chip probe: fused inverse-CDF engine vs the XLA systematic fast
path. Sweeps (tile, sr) knobs; prints particle-steps/s and logZ per
config so the auto policy and default knobs are set by measurement.

Usage: python benchmarks/probe_fused_cdf.py [d ...]   (default d=2)
Env: PROBE_N (default 1048576), PROBE_T (default 200),
     PROBE_RESAMPLER (systematic), PROBE_TILES ("2048,4096,8192"),
     PROBE_SRS ("8,16").
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cusmc_tpu.io.data import demo_model_params
from cusmc_tpu.models.dlm import DLM
from cusmc_tpu.smc.particle_filter import bootstrap_filter


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
    return best, float(out.log_evidence)


def main():
    n = int(os.environ.get("PROBE_N", 1_048_576))
    t = int(os.environ.get("PROBE_T", 200))
    resampler = os.environ.get("PROBE_RESAMPLER", "systematic")
    tiles = [int(x) for x in
             os.environ.get("PROBE_TILES", "2048,4096,8192").split(",")]
    srs = [int(x) for x in os.environ.get("PROBE_SRS", "8,16").split(",")]
    ds = [int(x) for x in (sys.argv[1:] or ["2"])]

    key = jax.random.key(0, impl="rbg")
    for d in ds:
        params = demo_model_params(d=d)
        model = DLM.create(noise="mvt", df=5.0, dtype=jnp.float32, **params)
        _, ys = model.simulate(key, t)
        ys = jnp.asarray(ys, jnp.float32)

        fn = jax.jit(lambda k: bootstrap_filter(
            k, model, ys, n, resampler=resampler, return_history=False,
            engine="xla"))
        dt, lz = measure(fn, key)
        print(f"d={d} xla {resampler}: {n*(t-1)/dt/1e6:8.1f} M p-s/s "
              f"({dt*1e3/(t-1):.3f} ms/step) logZ {lz:.1f}", flush=True)

        for sr in srs:
            for tile in tiles:
                if n % tile or tile < 512:
                    continue
                try:
                    fn = jax.jit(lambda k, tile=tile, sr=sr:
                                 bootstrap_filter(
                                     k, model, ys, n, resampler=resampler,
                                     return_history=False, engine="pallas",
                                     pallas_tile=tile,
                                     resampler_kwargs={"sr": sr}))
                    dt, lz = measure(fn, key)
                    print(f"d={d} fused sr={sr} tile={tile}: "
                          f"{n*(t-1)/dt/1e6:8.1f} M p-s/s "
                          f"({dt*1e3/(t-1):.3f} ms/step) logZ {lz:.1f}",
                          flush=True)
                except Exception as e:
                    print(f"d={d} fused sr={sr} tile={tile}: FAIL "
                          f"{type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
