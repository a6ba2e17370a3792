#!/usr/bin/env python
"""Probe 3: minimal same-shape take_along_axis lowering checks."""

import sys
import traceback

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

key = jax.random.key(0)


def check(d, w, label, indices_expr="direct"):
    x = jax.random.normal(key, (d, w), jnp.float32)
    idx = jax.random.randint(key, (d, w), 0, w, jnp.int32)

    def kernel(x_ref, i_ref, o_ref):
        o_ref[:, :] = jnp.take_along_axis(x_ref[:, :], i_ref[:, :], axis=1)

    def kernel_bcast(x_ref, i_ref, o_ref):
        ib = jnp.broadcast_to(i_ref[0:1, :], (d, w))
        o_ref[:, :] = jnp.take_along_axis(x_ref[:, :], ib, axis=1)

    k = kernel if indices_expr == "direct" else kernel_bcast
    try:
        out = pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((d, w), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx)
        ref = jnp.take_along_axis(x, idx if indices_expr == "direct"
                                  else jnp.broadcast_to(idx[0:1], (d, w)),
                                  axis=1)
        err = float(jnp.max(jnp.abs(jax.block_until_ready(out) - ref)))
        print(f"{label}: OK maxerr={err}")
    except Exception as e:
        lines = traceback.format_exc().splitlines()
        tail = [l for l in lines if "Error" in l or "error" in l][-2:]
        print(f"{label}: FAIL {type(e).__name__} | {' | '.join(tail)[:200]}")
    sys.stdout.flush()


check(8, 1024, "d=8 w=1024 direct")
check(1, 2048, "d=1 w=2048 direct")
check(2, 2048, "d=2 w=2048 direct")
check(3, 2048, "d=3 w=2048 direct")
check(8, 2048, "d=8 w=2048 bcast", "bcast")
print("done")
