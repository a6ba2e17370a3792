"""Posterior-predictive forecasting vs the closed-form Kalman predictive."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cusmc_tpu.io.data import demo_model_params, load_y_sim
from cusmc_tpu.models.dlm import DLM
from cusmc_tpu.smc.forecast import forecast
from cusmc_tpu.smc.kalman import kalman_filter
from cusmc_tpu.smc.particle_filter import bootstrap_filter


@pytest.fixture(scope="module")
def filtered():
    params = demo_model_params()
    ys = load_y_sim()[:201]
    model = DLM.create(noise="mvn", dtype=jnp.float32, **params)
    key = jax.random.key(7)
    res = bootstrap_filter(key, model, jnp.asarray(ys, jnp.float32), 8192,
                           resampler="systematic", return_history=False)
    return params, ys, model, res


def test_forecast_matches_kalman_predictive(filtered):
    params, ys, model, res = filtered
    h = 10
    xs, ysim = forecast(jax.random.key(3), model, res.final_particles,
                        res.final_log_weights, horizon=h)
    assert xs.shape == (h, 8192, 2) and ysim.shape == (h, 8192, 2)

    # Closed-form predictive: mean_h = G^h m_T, P_h = G P G' + W.
    km, kc, _ = kalman_filter(ys, **{k: params[k] for k in
                                     ("F", "G", "V", "W", "m0", "C0")})
    G = np.asarray(params["G"], np.float64)
    F = np.asarray(params["F"], np.float64)
    W = np.asarray(params["W"], np.float64)
    V = np.asarray(params["V"], np.float64)
    m = np.asarray(km[-1], np.float64)
    P = np.asarray(kc[-1], np.float64)
    for t in range(h):
        m = G @ m
        P = G @ P @ G.T + W
        mu_x = np.asarray(xs[t], np.float64).mean(axis=0)
        cov_x = np.cov(np.asarray(xs[t], np.float64).T)
        se = np.sqrt(np.diag(P) / xs.shape[1])
        assert np.all(np.abs(mu_x - m) < 6 * se + 1e-3)
        assert np.allclose(cov_x, P, rtol=0.15, atol=5e-3)
        mu_y = np.asarray(ysim[t], np.float64).mean(axis=0)
        cov_y = np.cov(np.asarray(ysim[t], np.float64).T)
        # Observation-mean MC error scale: diag(F P F' + V), not diag(P).
        se_y = np.sqrt(np.diag(F @ P @ F.T + V) / ysim.shape[1])
        assert np.all(np.abs(mu_y - F @ m) < 8 * se_y + 1e-3)
        assert np.allclose(cov_y, F @ P @ F.T + V, rtol=0.15, atol=5e-3)


def test_forecast_subsampling_and_uniform(filtered):
    _, _, model, res = filtered
    xs, ysim = forecast(jax.random.key(0), model, res.final_particles,
                        None, horizon=3, num_draws=256)
    assert xs.shape == (3, 256, 2) and ysim.shape == (3, 256, 2)
    # jittable
    f = jax.jit(lambda k: forecast(k, model, res.final_particles,
                                   res.final_log_weights, 3, 128))
    xs2, _ = f(jax.random.key(1))
    assert xs2.shape == (3, 128, 2)
    assert np.all(np.isfinite(np.asarray(xs2)))


def test_forecast_stochvol_runs():
    from cusmc_tpu.models.stochvol import StochasticVolatility

    sv = StochasticVolatility.create(mu=-1.0, phi=0.95, sigma=0.3)
    key = jax.random.key(2)
    x = sv.sample_initial(key, (512,))
    xs, ysim = forecast(key, sv, x, None, horizon=5)
    assert xs.shape[0] == 5 and np.all(np.isfinite(np.asarray(ysim)))
