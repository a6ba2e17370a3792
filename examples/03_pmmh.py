"""Parameter inference with particle marginal MH: infer a DLM's
observation-noise variance from data (capability absent in the reference)."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))  # run from anywhere

import jax
import jax.numpy as jnp
import numpy as np

from cusmc_tpu.mcmc.pmmh import pmmh
from cusmc_tpu.models import DLM

I1 = np.eye(1)
true_model = DLM.create(F=I1, G=0.9 * I1, m0=np.zeros(1), C0=I1,
                        V=0.04 * I1, W=0.01 * I1, dtype=jnp.float32)
_, ys = true_model.simulate(jax.random.key(11), 201)

builder = lambda th: DLM.create(
    F=I1, G=0.9 * I1, m0=np.zeros(1), C0=I1,
    V=jnp.exp(th[0]) * jnp.eye(1), W=0.01 * I1, dtype=jnp.float32)
log_prior = lambda th: -0.5 * jnp.sum(th ** 2) / 9.0

result = jax.jit(lambda k: pmmh(
    k, builder, log_prior, jnp.asarray([0.0], jnp.float32),
    jnp.asarray(ys, jnp.float32), num_particles=1024, num_steps=400,
    step_size=0.3))(jax.random.key(2))

post_v = np.exp(np.asarray(result.thetas)[200:, 0])
print("acceptance:", float(result.accept_rate))
print("posterior V median:", float(np.median(post_v)), "(true 0.04)")
