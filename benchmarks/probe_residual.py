"""Probe: where does the packed residual resampler's time go?

Round-3 finding target: the packed residual path (particle_filter.py
residual op) measured 67 M particle-steps/s at N=1M, d=2 vs systematic's
520 M. Hypothesis: one (or both) of the two inverse_cdf_apply calls
trips its runtime window-span check (`ok`) and silently runs the XLA
merge-rank + random-gather fallback (~8 ms/pass) every step.

Prints the span statistics and ok predicates for both kernel calls on
realistic post-reweight weights, then slope-times the stage groups.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cusmc_tpu.io.data import demo_model_params
from cusmc_tpu.models.dlm import DLM
from cusmc_tpu.ops.cumsum import blocked_cumsum
from cusmc_tpu.ops.monotone_gather import FOLD, SROWS
from cusmc_tpu.resampling.classic import _residual_positions
from cusmc_tpu.smc.particle_filter import bootstrap_filter

N = 1 << 20
D = 2


def realistic_logw():
    params = demo_model_params(d=D)
    model = DLM.create(noise="mvt", df=5.0, dtype=jnp.float32, **params)
    key = jax.random.key(0, impl="rbg")
    _, ys = model.simulate(key, 30)
    out = bootstrap_filter(key, model, jnp.asarray(ys, jnp.float32), N,
                           resampler="systematic", return_history=False)
    return out.final_log_weights


def span_stats(cdf, cdf128, positions, tile):
    nb = positions.shape[0] // tile
    m = cdf128.shape[0]
    q = jnp.concatenate([positions[::tile], positions[-1:]])
    merged = jnp.concatenate([cdf128, q.astype(cdf128.dtype)])
    rank = jnp.argsort(jnp.argsort(merged))
    r128 = (rank[m:] - jnp.arange(nb + 1)).astype(jnp.int32)
    srows = jnp.clip(r128[:-1], 0, positions.shape[0] // FOLD - SROWS)
    span = jnp.minimum(r128[1:], positions.shape[0] // FOLD - 1) - srows
    return int(jnp.max(span)), bool(jnp.all(span < SROWS))


def main():
    logw = realistic_logw()
    w = jax.nn.softmax(logw)
    nw = N * w
    counts = jnp.floor(nw)
    ccum, c128 = blocked_cumsum(counts)
    n_det = jnp.minimum(ccum[-1], N).astype(jnp.int32)
    rcdf, r128c = blocked_cumsum(jnp.maximum(nw - counts, 0.0))
    slots = jnp.arange(N, dtype=jnp.float32)
    p_det = jnp.minimum(slots + 0.5, n_det.astype(jnp.float32) - 0.5)
    key = jax.random.key(1, impl="rbg")
    v = jnp.minimum(_residual_positions(key, N, n_det, jnp.float32),
                    1.0 - 1e-6) * rcdf[-1]

    print("n_det =", int(n_det), f"({int(n_det)/N:.3f} of N)")
    for name, cdf, cs, pos, tile in [
        ("det", ccum, c128, p_det, 512),
        ("res", rcdf, r128c, v, 1024),
    ]:
        mx, ok = span_stats(cdf, cs, pos, tile)
        print(f"{name}: max span rows = {mx} (limit {SROWS}), ok = {ok}")


if __name__ == "__main__":
    main()
