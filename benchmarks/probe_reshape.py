"""Probe: can Mosaic reshape [d, qrows, FOLD] -> [d, qrows*FOLD] inside a
kernel (sublane->lane relayout), and what does a rank-3 dot_general lower
to? Decides the fused-CDF-step kernel structure (round 4): the merge-path
walk resolves values in [qrows, FOLD] vreg folds, but the MXU propagate
matmul wants [d, tile] with tile on lanes.

Run on the real chip: python benchmarks/probe_reshape.py
"""
import functools
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D, QROWS, FOLD = 4, 8, 128
TILE = QROWS * FOLD


def reshape_kernel(x_ref, g_ref, o_ref):
    xa = x_ref[...]                      # [D, QROWS, FOLD]
    xa2 = xa.reshape(D, TILE)            # sublane->lane relayout?
    mean = jax.lax.dot_general(
        g_ref[...], xa2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[...] = mean


def dot3_kernel(x_ref, g_ref, o_ref):
    xa = x_ref[...]                      # [D, QROWS, FOLD]
    mean = jax.lax.dot_general(
        g_ref[...], xa, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[...] = mean                    # [D, QROWS, FOLD]


def main():
    key = jax.random.key(0)
    x = jax.random.normal(key, (D, QROWS, FOLD), jnp.float32)
    g = jax.random.normal(jax.random.fold_in(key, 1), (D, D), jnp.float32)
    want = jnp.einsum("ij,jqf->iqf", g, x)

    try:
        out = pl.pallas_call(
            reshape_kernel,
            in_specs=[pl.BlockSpec(memory_space=None),
                      pl.BlockSpec(memory_space=None)],
            out_specs=pl.BlockSpec(memory_space=None),
            out_shape=jax.ShapeDtypeStruct((D, TILE), jnp.float32),
        )(x, g)
        err = float(jnp.max(jnp.abs(out.reshape(D, QROWS, FOLD) - want)))
        print(f"reshape-then-dot: OK, max err {err:.2e}")
    except Exception as e:
        print(f"reshape-then-dot: FAIL {type(e).__name__}: {str(e)[:300]}")

    try:
        out = pl.pallas_call(
            dot3_kernel,
            in_specs=[pl.BlockSpec(memory_space=None),
                      pl.BlockSpec(memory_space=None)],
            out_specs=pl.BlockSpec(memory_space=None),
            out_shape=jax.ShapeDtypeStruct((D, QROWS, FOLD), jnp.float32),
        )(x, g)
        err = float(jnp.max(jnp.abs(out - want)))
        print(f"rank-3 dot_general: OK, max err {err:.2e}")
    except Exception as e:
        print(f"rank-3 dot_general: FAIL {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
