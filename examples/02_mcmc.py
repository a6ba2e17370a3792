"""Multi-chain random-walk Metropolis-Hastings on an MVT target with
Robbins-Monro step-size adaptation (BASELINE configs 1/2 shape)."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))  # run from anywhere

import jax
import jax.numpy as jnp
import numpy as np

from cusmc_tpu.distributions import mvt_logpdf_cov
from cusmc_tpu.mcmc import metropolis_hastings_sampler

d, df, chains, steps = 16, 8.0, 256, 5000
cov = jnp.eye(d, dtype=jnp.float32)
log_prob = lambda x: mvt_logpdf_cov(x, jnp.zeros(d, jnp.float32), cov, df)

key = jax.random.key(0)
init = jax.random.normal(key, (chains, d), jnp.float32)
result = jax.jit(lambda k: metropolis_hastings_sampler(
    k, log_prob, init, steps, step_size=2.38 / np.sqrt(d),
    adapt_rate=0.05))(key)

samples = np.asarray(result.samples[steps // 2:]).reshape(-1, d)
print("acceptance:", float(result.accept_rate),
      "adapted step:", float(result.step_size))
print("sample var (expect", df / (df - 2.0), "):", samples.var(0).mean())

# --- gradient-based + adaptive samplers on the same target ---------------
from cusmc_tpu.mcmc import adaptive_mh_sampler, hmc_sampler, mala_sampler

for name, fn in [
    ("MALA", lambda k: mala_sampler(k, log_prob, init, 2000)),
    ("HMC", lambda k: hmc_sampler(k, log_prob, init, 1000,
                                  num_leapfrog=12)),
    ("adaptive-MH", lambda k: adaptive_mh_sampler(k, log_prob, init, 3000)),
]:
    r = jax.jit(fn)(key)
    s = np.asarray(r.samples[r.samples.shape[0] // 2:]).reshape(-1, d)
    print(f"{name}: acceptance {float(r.accept_rate):.3f}, "
          f"sample var {s.var(0).mean():.3f} "
          f"(expect {df / (df - 2.0):.3f})")
