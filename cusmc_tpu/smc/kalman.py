"""Exact Kalman filter — the correctness oracle for the linear-Gaussian DLM.

The reference has no tests (SURVEY.md §4); its bundled example model is
linear-Gaussian, so the filtering posterior has a closed form. This is the
strongest oracle available: particle-filter posterior means/covs must match
these within Monte-Carlo error (BASELINE.md). Runs in float64 on CPU-sized
problems; not a performance path.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def kalman_filter(ys, F, G, V, W, m0, C0):
    """Filtering means/covariances for x_t | y_{1:t}.

    ys [T, k] with row 0 ignored (t=0 is the prior; matches the particle
    filter's convention and the bundled data's zero first row).
    Returns (means [T, d], covs [T, d, d], loglik scalar) where row 0 is the
    prior (m0, C0) and loglik is sum_t log p(y_t | y_{1:t-1}).
    """
    ys = jnp.asarray(ys, jnp.float64)
    F = jnp.asarray(F, jnp.float64)
    G = jnp.asarray(G, jnp.float64)
    V = jnp.asarray(V, jnp.float64)
    W = jnp.asarray(W, jnp.float64)
    m0 = jnp.asarray(m0, jnp.float64)
    C0 = jnp.asarray(C0, jnp.float64)
    k = F.shape[0]

    def step(carry, y):
        m, c, ll = carry
        # Predict
        m_pred = G @ m
        c_pred = G @ c @ G.T + W
        # Update
        s = F @ c_pred @ F.T + V
        resid = y - F @ m_pred
        sol_resid = jnp.linalg.solve(s, resid)
        gain = jnp.linalg.solve(s, F @ c_pred).T
        m_new = m_pred + gain @ resid
        c_new = c_pred - gain @ s @ gain.T
        ll_inc = -0.5 * (resid @ sol_resid + jnp.linalg.slogdet(s)[1]
                         + k * jnp.log(2.0 * jnp.pi))
        return (m_new, c_new, ll + ll_inc), (m_new, c_new)

    (m_f, c_f, loglik), (ms, cs) = lax.scan(step, (m0, C0, 0.0), ys[1:])
    means = jnp.concatenate([m0[None], ms], axis=0)
    covs = jnp.concatenate([C0[None], cs], axis=0)
    return means, covs, loglik


def rts_smoother(ys, F, G, V, W, m0, C0):
    """Rauch-Tung-Striebel smoother: exact E[x_t | y_{1:T}] for the
    linear-Gaussian DLM — the oracle for particle smoothers
    (tests/test_ffbs.py). Returns (smoothed means [T, d], covs [T, d, d]).
    """
    means, covs, _ = kalman_filter(ys, F, G, V, W, m0, C0)
    G = jnp.asarray(G, means.dtype)
    W = jnp.asarray(W, means.dtype)

    def back(carry, mc):
        m_next_s, c_next_s = carry
        m_t, c_t = mc
        pred_cov = G @ c_t @ G.T + W
        gain = jnp.linalg.solve(pred_cov, G @ c_t).T
        m_s = m_t + gain @ (m_next_s - G @ m_t)
        c_s = c_t + gain @ (c_next_s - pred_cov) @ gain.T
        return (m_s, c_s), (m_s, c_s)

    (m0_s, c0_s), (ms_rev, cs_rev) = lax.scan(
        back, (means[-1], covs[-1]), (means[:-1][::-1], covs[:-1][::-1]))
    sm = jnp.concatenate([ms_rev[::-1], means[-1][None]], axis=0)
    sc = jnp.concatenate([cs_rev[::-1], covs[-1][None]], axis=0)
    return sm, sc
