"""Liu-West filter tests.

Oracle: a 1-D linear-Gaussian DLM with unknown transition coefficient g.
The exact parameter posterior p(g | y_{1:T}) is computable by a Kalman
grid (marginal likelihood x prior over a g-grid) — the Liu-West posterior
mean must land within Monte-Carlo error of it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cusmc_tpu.smc.kalman import kalman_filter
from cusmc_tpu.smc.liu_west import liu_west_filter

G_TRUE = 0.8
W_VAR = 0.3
V_VAR = 0.5
T = 300


def make_data(seed=3):
    rng = np.random.default_rng(seed)
    x = 0.0
    ys = np.zeros((T, 1), np.float32)
    for t in range(1, T):
        x = G_TRUE * x + rng.normal(0, np.sqrt(W_VAR))
        ys[t, 0] = x + rng.normal(0, np.sqrt(V_VAR))
    return jnp.asarray(ys)


def model_fns():
    sw = np.sqrt(W_VAR).astype(np.float32)
    sv = np.sqrt(V_VAR).astype(np.float32)

    def sample_initial(key, n, theta):
        return jax.random.normal(key, (n, 1), jnp.float32)

    def propagate(key, x, theta):
        return theta[:, :1] * x + sw * jax.random.normal(key, x.shape,
                                                         jnp.float32)

    def propagate_mean(x, theta):
        return theta[:, :1] * x

    def observation_logpdf(y, x, theta):
        r = y[0] - x[:, 0]
        return (-0.5 * r * r / V_VAR
                - 0.5 * np.log(2.0 * np.pi * V_VAR)).astype(jnp.float32)

    def theta_prior_sample(key, n):
        # Prior on g: N(0.5, 0.2^2).
        return 0.5 + 0.2 * jax.random.normal(key, (n, 1), jnp.float32)

    return (sample_initial, propagate, propagate_mean, observation_logpdf,
            theta_prior_sample)


def grid_posterior_mean(ys):
    """Exact posterior mean of g via Kalman marginal likelihood x prior."""
    gs = np.linspace(0.3, 1.1, 161)
    logp = np.zeros_like(gs)
    for i, g in enumerate(gs):
        _, _, ll = kalman_filter(np.asarray(ys, np.float64),
                                 np.eye(1), np.array([[g]]),
                                 np.array([[V_VAR]]), np.array([[W_VAR]]),
                                 np.zeros(1), np.eye(1))
        logp[i] = float(ll) - 0.5 * ((g - 0.5) / 0.2) ** 2
    logp -= logp.max()
    w = np.exp(logp)
    w /= w.sum()
    return float((w * gs).sum()), float(np.sqrt((w * gs**2).sum()
                                                - (w * gs).sum() ** 2))


@pytest.fixture(scope="module")
def data():
    return make_data()


class TestLiuWest:
    def test_parameter_posterior_matches_grid_oracle(self, data, key):
        fns = model_fns()
        res = jax.jit(lambda k: liu_west_filter(
            k, *fns, data, num_particles=8192))(key)
        oracle_mean, oracle_sd = grid_posterior_mean(data)
        lw_mean = float(res.theta_mean[-1, 0])
        # Liu-West is approximate (shrinkage bias + MC error): within a few
        # posterior SDs of the exact answer.
        assert abs(lw_mean - oracle_mean) < 3.0 * oracle_sd + 0.02, (
            f"LW {lw_mean} vs oracle {oracle_mean} (sd {oracle_sd})")
        assert np.isfinite(float(res.log_evidence))

    def test_learning_trajectory_converges(self, data, key):
        fns = model_fns()
        res = liu_west_filter(key, *fns, data, num_particles=4096)
        tm = np.asarray(res.theta_mean[:, 0])
        # Starts at the prior mean, ends materially closer to the truth.
        assert abs(tm[0] - 0.5) < 0.02
        assert abs(tm[-1] - G_TRUE) < abs(tm[0] - G_TRUE)
        assert abs(tm[-1] - G_TRUE) < 0.1

    def test_shapes_history_reproducible(self, data, key):
        fns = model_fns()
        short = data[:50]
        r1 = liu_west_filter(key, *fns, short, 256, return_history=True)
        assert r1.thetas.shape == (50, 256, 1)
        assert r1.xs.shape == (50, 256, 1)
        assert r1.ess.shape == (50,)
        r2 = jax.jit(lambda k: liu_west_filter(
            k, *fns, short, 256, return_history=True))(key)
        np.testing.assert_allclose(np.asarray(r1.final_theta),
                                   np.asarray(r2.final_theta),
                                   rtol=1e-5, atol=1e-6)

    def test_delta_validation(self, data, key):
        fns = model_fns()
        with pytest.raises(ValueError):
            liu_west_filter(key, *fns, data, 64, delta=0.4)
