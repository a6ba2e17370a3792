"""Auxiliary particle filter (Pitt & Shephard 1999).

The bootstrap filter (the reference's only algorithm) proposes blindly from
the transition and pays for it when observations are informative. The APF
adds a one-step lookahead: first-stage weights include the predictive
likelihood at the transition mean, so resampling favours particles that
will explain y_t BEFORE propagation; the second-stage weight corrects the
bias exactly:

    stage 1:  v_i    = logw_i + lambda_i(y_t)
              a      ~ resample(v)
    stage 2:  x_t    ~ p(. | x_{t-1}^a)
              logw_t = log p(y_t | x_t) - lambda_{a}(y_t)

where the lookahead lambda_i is, in order of preference:
  1. ``model.lookahead_logpdf(y, x_prev)`` — the exact predictive
     p(y_t | x_{t-1}) when available (DLM provides it in closed form:
     the "fully adapted" APF, whose second-stage weights have minimal
     variance), else
  2. the point lookahead p(y_t | E[x_t | x_{t-1}]) via
     ``model.propagate_mean`` (Pitt & Shephard's original; NOTE it can
     be counterproductive when transition noise >> observation noise).

The second-stage weight corrects ANY first-stage choice exactly, so both
variants target the same posterior. Same ``FilterResult`` as the bootstrap
filter; log-evidence uses the standard APF estimator.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.special import logsumexp

from cusmc_tpu.diagnostics.metrics import effective_sample_size, log_normalize
from cusmc_tpu.resampling import get_resampler
from cusmc_tpu.smc.particle_filter import FilterResult


def auxiliary_filter(
    key: jax.Array,
    model,
    ys: jnp.ndarray,
    num_particles: int,
    resampler: str = "systematic",
    resampler_kwargs: Optional[dict] = None,
    return_history: bool = True,
) -> FilterResult:
    """Run the APF on observations ``ys`` [T, k] (row 0 = prior step)."""
    if hasattr(model, "lookahead_logpdf"):
        lookahead = model.lookahead_logpdf
    elif hasattr(model, "propagate_mean"):
        lookahead = lambda y, x: model.observation_logpdf(
            y, model.propagate_mean(x))
    else:
        raise ValueError("auxiliary_filter needs model.lookahead_logpdf "
                         "or model.propagate_mean")
    res_fn = get_resampler(resampler, **(resampler_kwargs or {}))
    n = num_particles

    k_init, k_scan = jax.random.split(key)
    x0 = model.sample_initial(k_init, (n,))
    logw0 = jnp.full((n,), -math.log(n), x0.dtype)

    def step(carry, inp):
        x, logw, key = carry
        t, y_t = inp
        key_t = jax.random.fold_in(key, t)
        k_res, k_prop = jax.random.split(key_t)

        ess = effective_sample_size(logw)

        look = lookahead(y_t, x)
        v = logw + look
        # APF evidence increment, part 1: log sum of first-stage weights.
        lse_v = logsumexp(v)

        a = res_fn(k_res, v - lse_v)
        x_new = model.propagate(k_prop, x[a])
        ll = model.observation_logpdf(y_t, x_new)
        logw_raw = ll - look[a]
        logw_new, lse_w = log_normalize(logw_raw)
        # Evidence: log( sum_i vbar_i ) ... standard estimator:
        # Z_t = (sum_i exp(v_i)) * mean_i exp(logw_raw_i) with logw prev
        # normalized; logw carried normalized so lse_v is the first factor.
        lz_inc = lse_v + lse_w - math.log(n)

        carry = (x_new, logw_new, key)
        # History stores the TRUE per-step filter log-weights (ll - look[a]),
        # not the raw observation loglik: downstream consumers (posterior
        # means, ffbs) reconstruct weights from this field.
        history = (x_new, logw_raw, a) if return_history else ()
        return carry, (history, ess, lz_inc)

    num_steps = ys.shape[0]
    ts = jnp.arange(1, num_steps)
    (x_f, logw_f, _), (history, esss, lzs) = lax.scan(
        step, (x0, logw0, k_scan), (ts, ys[1:]))

    ess0 = effective_sample_size(logw0)
    ess = jnp.concatenate([ess0[None], esss])
    log_evidence = jnp.sum(lzs)

    if not return_history:
        return FilterResult(final_particles=x_f, final_log_weights=logw_f,
                            ess=ess, log_evidence=log_evidence)
    xs, lls, ancs = history
    particles = jnp.concatenate([x0[None], xs], axis=0)
    obs_loglik = jnp.concatenate([logw0[None], lls], axis=0)
    a0 = jnp.arange(n, dtype=jnp.int32)
    ancestors = jnp.concatenate([a0[None], ancs], axis=0)
    return FilterResult(final_particles=x_f, final_log_weights=logw_f,
                        ess=ess, log_evidence=log_evidence,
                        particles=particles, obs_loglik=obs_loglik,
                        ancestors=ancestors)
