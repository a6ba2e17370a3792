"""k-step-ahead predictive simulation from a filtered particle cloud.

The reference has no forecasting capability (its commented-out ``step()``
API, ``/root/reference/src/run.rcpp.cpp:199-261``, hints at an intended
incremental mode that would have enabled it but was never finished). Here
the posterior predictive p(x_{T+h}, y_{T+h} | y_{1:T}) is sampled exactly:
draw ancestors from the weighted final cloud, then roll the model's
transition/observation samplers forward ``horizon`` steps inside one
``lax.scan``.

Works with any model exposing ``propagate(key, x)`` and
``sample_observation(key, x)`` over batched ``[..., d]`` states (DLM,
stochastic volatility, any ``models.base`` protocol model).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def forecast(key: jax.Array, model, particles: jnp.ndarray,
             log_weights: Optional[jnp.ndarray], horizon: int,
             num_draws: Optional[int] = None
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample ``num_draws`` predictive trajectories of length ``horizon``.

    ``particles`` [N, d] and ``log_weights`` [N] (None = uniform) are the
    filter's final cloud (``FilterResult.final_particles`` /
    ``.final_log_weights``). Returns ``(xs [H, M, d], ys [H, M, k])`` —
    equally-weighted draws from the joint posterior predictive; moments
    and quantiles are plain reductions over the draw axis.
    """
    n = particles.shape[0]
    m = n if num_draws is None else num_draws
    k_anc, k_scan = jax.random.split(key)
    if log_weights is None:
        if m == n:
            x0 = particles
        else:
            idx = jax.random.randint(k_anc, (m,), 0, n)
            x0 = particles[idx]
    else:
        idx = jax.random.categorical(k_anc, log_weights, shape=(m,))
        x0 = particles[idx]

    def step(x, kt):
        kp, ko = jax.random.split(kt)
        x_next = model.propagate(kp, x)
        y_next = model.sample_observation(ko, x_next)
        return x_next, (x_next, y_next)

    keys = jax.random.split(k_scan, horizon)
    _, (xs, ys) = lax.scan(step, x0, keys)
    return xs, ys
