#!/usr/bin/env python
"""Bound the headroom of any cheaper CDF-apply formulation (round 5,
VERDICT weak #4: "try the run-length/offspring-count formulation").

Every run-length / one-hot / histogram variant of the monotone apply
must still compute, per query, (boundary row, in-row rank) — the
monotone gather IS the rank computation (see RESULTS.md writeup). What
such a formulation could at best eliminate is phase B (the 7-round
in-row bisection over select chains) and/or the per-d value select
chains. This probe measures those exact ceilings ON the production
kernel via ablation switches (identical grid/DMA structure, wrong
results by construction):

  full        search + phase B + value selects   (production)
  ablate=b    search + value selects, rank=0     (phase-B ceiling)
  ablate=sel  search + phase B, no value writes  (value-select ceiling)
  search-only ancestors only, no state windows   (inverse_cdf_search)

Run on the chip: python benchmarks/probe_phaseb.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cusmc_tpu.ops.cumsum import blocked_cumsum
from cusmc_tpu.ops.monotone_gather import (
    inverse_cdf_apply,
    inverse_cdf_search,
)
from cusmc_tpu.resampling.classic import systematic_positions
from cusmc_tpu.utils.timing import scan_slope

N = 1 << 20
D = int(os.environ.get("PROBE_D", 2))


def slope(name, body, carry, steps=(16, 256)):
    def mk(c, T):
        def f(c, i):
            return body(c, i), ()
        out, _ = jax.lax.scan(f, c, jnp.arange(T))
        return out

    t = scan_slope(mk, carry, steps=steps, reps=3)
    print(f"{name}: {t*1e3:.3f} ms  ({t/N*1e9:.3f} ns/particle)",
          flush=True)


def main():
    key = jax.random.key(0)
    kw, kp, kx = jax.random.split(key, 3)
    w = jnp.exp(0.5 * jax.random.normal(kw, (N,), jnp.float32))
    cdf, cdf128 = blocked_cumsum(w)
    total = cdf128[-1]
    X = jax.random.normal(kx, (D, N), jnp.float32)
    pos = systematic_positions(kp, N, jnp.float32) * total

    for ab, tag in ((None, "full       "), ("b", "ablate=b   "),
                    ("sel", "ablate=sel "), ("fastb", "fastb      ")):
        slope(f"inverse_cdf_apply {tag} d={D}",
              lambda c, i, ab=ab: inverse_cdf_apply(
                  cdf, pos + i * 1e-12, c, cdf128=cdf128,
                  _ablate=ab)[0], X)
    # Consume the FULL ancestor vector so nothing can be elided.
    slope("inverse_cdf_search (no state)",
          lambda c, i: c + 1e-9 * inverse_cdf_search(
              cdf, pos + i * 1e-12, cdf128=cdf128).astype(
                  jnp.float32)[None, :], X)


if __name__ == "__main__":
    main()
