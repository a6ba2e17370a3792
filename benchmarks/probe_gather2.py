#!/usr/bin/env python
"""Probe 2: which in-kernel dynamic-gather formulations lower in Mosaic."""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D, T, W = 8, 512, 1024
key = jax.random.key(0)
xw = jax.random.normal(key, (D, W), jnp.float32)
idx1 = jnp.sort(jax.random.randint(key, (1, T), 0, W, jnp.int32), axis=1)
ref = jnp.take_along_axis(xw, jnp.broadcast_to(idx1, (D, T)), axis=1)


def try_kernel(name, kernel, out_shape, *args, full_tb=False):
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
        print(f"{name}: OK maxerr={err}")
        return True
    except Exception as e:
        tb = traceback.format_exc()
        last = [l for l in tb.splitlines() if l.strip()][-6:]
        print(f"{name}: FAIL {type(e).__name__}")
        if full_tb:
            print("\n".join(last))
        return False


# 1. take_along_axis minor axis, full traceback
def k1(x_ref, i_ref, o_ref):
    rel = jnp.broadcast_to(i_ref[:, :], (D, T))
    o_ref[:, :] = jnp.take_along_axis(x_ref[:, :], rel, axis=1)

try_kernel("take_along_axis axis=1", k1,
           jax.ShapeDtypeStruct((D, T), jnp.float32), xw, idx1, full_tb=True)


# 2. gather along sublanes (axis 0) on transposed window
xwT = xw.T  # [W, D]
idxT = jnp.broadcast_to(idx1.reshape(T, 1), (T, D))

def k2(x_ref, i_ref, o_ref):
    o_ref[:, :] = jnp.take_along_axis(x_ref[:, :], i_ref[:, :], axis=0)

refT = ref.T
try:
    out = pl.pallas_call(
        k2,
        out_shape=jax.ShapeDtypeStruct((T, D), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(xwT, idxT)
    out = jax.block_until_ready(out)
    print(f"take_along_axis axis=0 (sublane): OK "
          f"maxerr={float(jnp.max(jnp.abs(out - refT)))}")
except Exception as e:
    tb = traceback.format_exc()
    last = [l for l in tb.splitlines() if l.strip()][-6:]
    print(f"take_along_axis axis=0 (sublane): FAIL {type(e).__name__}")
    print("\n".join(last))


# 3. one row at a time, 1-D gather via x_ref[0, idx]
def k3(x_ref, i_ref, o_ref):
    idx = i_ref[0, :]
    for j in range(D):
        row = x_ref[j, :]
        o_ref[j, :] = row[idx]

try_kernel("row[idx] advanced 1d", k3,
           jax.ShapeDtypeStruct((D, T), jnp.float32), xw, idx1)


# 4. in-kernel binary search then... just test dynamic_slice with traced
#    start per LANE is impossible; test pltpu.roll with traced scalar shift
def k4(x_ref, i_ref, o_ref):
    s = i_ref[0, 0]
    o_ref[:, :] = pltpu.roll(x_ref[:, :], s, 1)[:, :T]

try_kernel("pltpu.roll traced shift", k4,
           jax.ShapeDtypeStruct((D, T), jnp.float32), xw, idx1)


# 5. jax.lax.gather via vmap-free take
def k5(x_ref, i_ref, o_ref):
    o_ref[:, :] = jnp.take(x_ref[:, :], i_ref[0, :], axis=1)

try_kernel("jnp.take axis=1", k5,
           jax.ShapeDtypeStruct((D, T), jnp.float32), xw, idx1)

# 6. int32 bitcast gather (in case only some dtypes supported) - skip

# 7. take_along_axis axis=1 with idx dtype int16? skip

print("done")
