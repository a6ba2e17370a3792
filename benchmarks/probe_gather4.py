#!/usr/bin/env python
"""Probe 4: does Mosaic lane-gather support per-element (sublane-varying)
indices? out[i,j] = src[i, idx[i,j]] with idx fully varying."""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

key = jax.random.key(0)
src = jax.random.normal(key, (8, 128), jnp.float32)
idx = jax.random.randint(jax.random.key(1), (8, 128), 0, 128, jnp.int32)
ref = jnp.take_along_axis(src, idx, axis=1)


def run(name, kernel, *args, out_shape):
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*args)
        out = jax.block_until_ready(out)
        err = float(jnp.max(jnp.abs(out - ref))) if out.shape == ref.shape \
            else -1.0
        print(f"{name}: OK maxerr={err}", flush=True)
        return True
    except Exception:
        tb = traceback.format_exc().splitlines()
        print(f"{name}: FAIL\n  " + "\n  ".join(tb[-4:]), flush=True)
        return False


def k_lane(x_ref, i_ref, o_ref):
    o_ref[:, :] = jnp.take_along_axis(x_ref[:, :], i_ref[:, :], axis=1)


run("lane gather, per-element idx [8,128]", k_lane, src, idx,
    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))


# sublane gather with per-element idx
idx8 = jax.random.randint(jax.random.key(2), (8, 128), 0, 8, jnp.int32)
ref = jnp.take_along_axis(src, idx8, axis=0)


def k_sub(x_ref, i_ref, o_ref):
    o_ref[:, :] = jnp.take_along_axis(x_ref[:, :], i_ref[:, :], axis=0)


run("sublane gather, per-element idx [8,128]", k_sub, src, idx8,
    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))

print("done", flush=True)
