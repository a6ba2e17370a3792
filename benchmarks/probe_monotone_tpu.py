#!/usr/bin/env python
"""On-chip validation + timing of ops/monotone_gather.

NOTE: each Mosaic compile of the fused kernel takes ~1-2 min through the
axon tunnel; this probe jits few distinct programs on purpose.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cusmc_tpu.ops.monotone_gather import (
    _merge_rank_ancestors, inverse_cdf_apply)
from cusmc_tpu.resampling.classic import POSITION_FNS
from cusmc_tpu.utils.timing import scan_slope

N = 1 << 20
D = int(os.environ.get("PROBE_D", 2))


def main():
    print("devices:", jax.devices(), flush=True)
    key = jax.random.key(0)
    kw, kp, kx = jax.random.split(key, 3)
    logw = jax.random.normal(kw, (N,), jnp.float32)
    cdf = jnp.cumsum(jax.nn.softmax(logw))
    X = jax.random.normal(kx, (D, N), jnp.float32)

    # correctness on chip: kernel vs merge-rank (systematic positions)
    positions = POSITION_FNS["systematic"](kp, N, jnp.float32)
    y, a = jax.jit(inverse_cdf_apply)(cdf, positions, X)
    a_ref = _merge_rank_ancestors(cdf, positions)
    mism = int(jnp.sum(a != a_ref))
    y_ref = jnp.take(X, a_ref, axis=1)
    maxerr = float(jnp.max(jnp.abs(y - y_ref)))
    print(f"systematic: ancestor mismatches={mism}, y maxerr={maxerr}",
          flush=True)

    # full filter throughput: systematic vs metropolis
    from cusmc_tpu.io.data import demo_model_params
    from cusmc_tpu.models.dlm import DLM
    from cusmc_tpu.smc.particle_filter import bootstrap_filter

    model = DLM.create(noise="mvt", df=5.0, **demo_model_params(d=D))
    kk = jax.random.key(0, impl="rbg")
    _, ys = model.simulate(kk, 257)
    ys = jnp.asarray(ys, jnp.float32)

    for name in ("systematic", "metropolis"):
        def mk_filter(carry, T, name=name):
            res = bootstrap_filter(carry, model, ys[:T + 1], N,
                                   resampler=name, return_history=False)
            return res.log_evidence

        t = scan_slope(mk_filter, kk, steps=(16, 256), reps=3)
        print(f"filter {name}: {t*1e3:.3f} ms/step = "
              f"{N/t/1e6:.0f} M particle-steps/s", flush=True)


if __name__ == "__main__":
    main()
