#!/usr/bin/env python
"""Weak-scaling benchmark for the sharded particle filter.

BASELINE north star: >=90% weak-scaling efficiency at 1M sharded particles
on a pod slice. This session's environment exposes ONE physical chip, so
this script measures weak scaling on whatever devices exist (pass
SCALE_FAKE_DEVICES=8 to use virtual CPU devices for a topology smoke test —
throughput numbers are then meaningless, only the mechanics are exercised).

Protocol: fix particles-per-device (SCALE_LOCAL_N, default 131072); run the
sharded MVT filter on meshes of 1, 2, 4, ... devices; efficiency(k) =
throughput(k) / (k * throughput(1)). Prints one JSON line per mesh size.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("SCALE_FAKE_DEVICES"):
    n_fake = int(os.environ["SCALE_FAKE_DEVICES"])
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count={n_fake}")
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import jax.numpy as jnp
import numpy as np

from cusmc_tpu.io.data import demo_model_params
from cusmc_tpu.models.dlm import DLM
from cusmc_tpu.parallel import make_mesh, sharded_bootstrap_filter


def main():
    local_n = int(os.environ.get("SCALE_LOCAL_N", 131_072))
    steps = int(os.environ.get("SCALE_T", 50))
    resampler = os.environ.get("SCALE_RESAMPLER", "metropolis")
    params = demo_model_params()
    model = DLM.create(noise="mvt", df=5.0, dtype=jnp.float32, **params)
    key = jax.random.key(0)
    _, ys = model.simulate(key, steps)
    ys = jnp.asarray(ys, jnp.float32)

    devices = jax.devices()
    sizes = []
    k = 1
    while k <= len(devices):
        sizes.append(k)
        k *= 2

    base_rate = None
    for k in sizes:
        mesh = make_mesh({"particles": k}, devices=devices[:k])
        n = local_n * k
        fn = jax.jit(lambda kk, mesh=mesh, n=n: sharded_bootstrap_filter(
            kk, model, ys, n, mesh, resampler=resampler))
        out = fn(key)
        _ = np.asarray(out.log_evidence)
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            out = fn(jax.random.fold_in(key, i))
            _ = np.asarray(out.log_evidence)
            best = min(best, time.perf_counter() - t0)
        rate = n * (steps - 1) / best
        if base_rate is None:
            base_rate = rate
        print(json.dumps({
            "devices": k,
            "resampler": resampler,
            "particles": n,
            "particle_steps_per_sec": rate,
            "weak_scaling_efficiency": rate / (k * base_rate),
        }))


if __name__ == "__main__":
    main()
