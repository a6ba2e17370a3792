"""SMC^2 tests against the exact grid-Kalman parameter posterior (same
oracle as the Liu-West tests — SMC^2 should be MORE accurate since its
PMMH rejuvenation is exact)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cusmc_tpu.smc.smc2 import smc2
from tests.test_liu_west import (G_TRUE, V_VAR, W_VAR, grid_posterior_mean,
                                 make_data)


def model_fns():
    sw = np.sqrt(W_VAR).astype(np.float32)

    # theta is [p=1]: the transition coefficient g (inner-cloud callables
    # take ONE theta, unlike Liu-West's per-particle thetas).
    def sample_initial(key, n, theta):
        return jax.random.normal(key, (n, 1), jnp.float32)

    def propagate(key, x, theta):
        return theta[0] * x + sw * jax.random.normal(key, x.shape,
                                                     jnp.float32)

    def observation_logpdf(y, x, theta):
        r = y[0] - x[:, 0]
        return (-0.5 * r * r / V_VAR
                - 0.5 * np.log(2.0 * np.pi * V_VAR)).astype(jnp.float32)

    def theta_prior_sample(key, n):
        return 0.5 + 0.2 * jax.random.normal(key, (n, 1), jnp.float32)

    def theta_prior_logpdf(theta):
        return -0.5 * ((theta[:, 0] - 0.5) / 0.2) ** 2

    return (sample_initial, propagate, observation_logpdf,
            theta_prior_sample, theta_prior_logpdf)


@pytest.fixture(scope="module")
def data():
    return make_data()[:150]


class TestSMC2:
    def test_posterior_matches_grid_oracle(self, data, key):
        fns = model_fns()
        res = jax.jit(lambda k: smc2(
            k, *fns, data, num_theta=96, num_x=192))(key)
        oracle_mean, oracle_sd = grid_posterior_mean(data)
        w = np.exp(np.asarray(res.log_weights))
        w /= w.sum()
        mean = float(w @ np.asarray(res.thetas)[:, 0])
        assert abs(mean - oracle_mean) < 3.0 * oracle_sd + 0.03, (
            f"SMC2 {mean} vs oracle {oracle_mean} (sd {oracle_sd})")
        assert int(res.num_rejuvenations) >= 1
        assert 0.0 <= float(res.accept_rate) <= 1.0
        assert np.isfinite(float(res.log_evidence))

    def test_evidence_path_monotone_structure(self, data, key):
        fns = model_fns()
        res = smc2(key, *fns, data, num_theta=48, num_x=96)
        path = np.asarray(res.log_evidence_path)
        assert path.shape == (data.shape[0],)
        assert path[0] == 0.0
        # log p(y_1:t) decreases in t for densities < 1 at these scales
        # (each increment is a log predictive density, typically < 0 here).
        assert path[-1] == pytest.approx(float(res.log_evidence))
        assert np.isfinite(path).all()

    def test_reproducible_jit(self, data, key):
        fns = model_fns()
        short = data[:40]
        r1 = smc2(key, *fns, short, num_theta=16, num_x=32)
        r2 = jax.jit(lambda k: smc2(k, *fns, short,
                                    num_theta=16, num_x=32))(key)
        np.testing.assert_allclose(np.asarray(r1.thetas),
                                   np.asarray(r2.thetas),
                                   rtol=1e-5, atol=1e-6)

    def test_ess_triggers_rejuvenation(self, data, key):
        fns = model_fns()
        # Aggressive threshold: rejuvenate nearly every step.
        hi = smc2(key, *fns, data[:60], num_theta=24, num_x=48,
                  ess_threshold=0.95)
        lo = smc2(key, *fns, data[:60], num_theta=24, num_x=48,
                  ess_threshold=0.05)
        assert int(hi.num_rejuvenations) > int(lo.num_rejuvenations)
