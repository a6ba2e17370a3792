"""Marginalized and online-learning filters.

1. Rao-Blackwellized particle filter on a conditionally linear-Gaussian
   model: a scalar random-walk phase u_t enters the observation offset;
   the 3-D linear substate is marginalized by per-particle Kalman banks.
2. Liu-West filter: learn a DLM's transition coefficient ONLINE while
   filtering its state.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))  # run from anywhere

import jax
import jax.numpy as jnp
import numpy as np

from cusmc_tpu import CLGSSM, liu_west_filter, rao_blackwell_filter

key = jax.random.key(0)

# --- 1. RBPF --------------------------------------------------------------
D, K = 3, 2
G = 0.9 * np.eye(D, dtype=np.float32)
F = np.asarray(np.random.default_rng(0).standard_normal((K, D)), np.float32)

model = CLGSSM.create(
    nl_dim=1, lin_dim=D, obs_dim=K,
    sample_initial_nl=lambda p, k, n: 0.1 * jax.random.normal(
        k, (n, 1), jnp.float32),
    propagate_nl=lambda p, k, u: u + 0.15 * jax.random.normal(
        k, u.shape, u.dtype),
    Fmat=lambda p, u: jnp.asarray(F),
    Gmat=lambda p, u: jnp.asarray(G),
    Vcov=lambda p, u: 0.5 * jnp.eye(K),
    Wcov=lambda p, u: 0.3 * jnp.eye(D),
    c=lambda p, u: jnp.stack([jnp.sin(u[0]), jnp.cos(u[0])]),
    m0=np.zeros(D), C0=np.eye(D),
    mats_constant=True)  # F/G/V/W fixed -> shared-covariance fast path

ys = np.random.default_rng(1).standard_normal((200, K)).astype(np.float32)
res = jax.jit(lambda k: rao_blackwell_filter(
    k, model, jnp.asarray(ys), num_particles=4096))(key)
print(f"RBPF: log-evidence {float(res.log_evidence):.2f}, "
      f"final ESS {float(res.ess[-1]):.0f}/4096, "
      f"E[z_T] = {np.asarray(res.filtered_mean[-1]).round(3)}")

# --- 2. Liu-West ----------------------------------------------------------
G_TRUE, W_VAR, V_VAR, T = 0.8, 0.3, 0.5, 300
rng = np.random.default_rng(3)
x, ys2 = 0.0, np.zeros((T, 1), np.float32)
for t in range(1, T):
    x = G_TRUE * x + rng.normal(0, np.sqrt(W_VAR))
    ys2[t, 0] = x + rng.normal(0, np.sqrt(V_VAR))

lw = jax.jit(lambda k: liu_west_filter(
    k,
    sample_initial=lambda k_, n, th: jax.random.normal(k_, (n, 1),
                                                       jnp.float32),
    propagate=lambda k_, xs, th: th[:, :1] * xs + np.sqrt(W_VAR).astype(
        np.float32) * jax.random.normal(k_, xs.shape, jnp.float32),
    propagate_mean=lambda xs, th: th[:, :1] * xs,
    observation_logpdf=lambda y, xs, th: (
        -0.5 * (y[0] - xs[:, 0]) ** 2 / V_VAR
        - 0.5 * np.log(2 * np.pi * V_VAR)).astype(jnp.float32),
    theta_prior_sample=lambda k_, n: 0.5 + 0.2 * jax.random.normal(
        k_, (n, 1), jnp.float32),
    ys=jnp.asarray(ys2), num_particles=8192))(key)
print(f"Liu-West: E[g | y_1:t] trajectory "
      f"{np.asarray(lw.theta_mean[::60, 0]).round(3)} (truth {G_TRUE})")
