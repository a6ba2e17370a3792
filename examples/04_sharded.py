"""Particle-sharded filtering over a device mesh. On a multi-chip slice
this uses all chips; on one chip (or CPU) it still runs — set
XLA_FLAGS=--xla_force_host_platform_device_count=8 with JAX_PLATFORMS=cpu
to exercise an 8-way virtual mesh."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))  # run from anywhere

import jax
import jax.numpy as jnp
import numpy as np

from cusmc_tpu.models import DLM
from cusmc_tpu.io.data import demo_model_params, load_y_sim
from cusmc_tpu.parallel import make_mesh, sharded_bootstrap_filter

params = demo_model_params()
model = DLM.create(noise="mvt", df=5.0, dtype=jnp.float32, **params)
ys = jnp.asarray(load_y_sim()[:501], jnp.float32)

n_dev = len(jax.devices())
mesh = make_mesh({"particles": n_dev})
n = 16384 * n_dev

result = sharded_bootstrap_filter(jax.random.key(0), model, ys, n, mesh,
                                  resampler="metropolis")
print(f"devices: {n_dev}, particles: {n}")
print("log evidence:", float(result.log_evidence))
print("final ESS:", float(np.asarray(result.ess)[-1]))
