"""EnKF tests: on a linear-Gaussian DLM the EnKF converges to the exact
Kalman filter as the ensemble grows — the same oracle as the particle
filter tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cusmc_tpu.io.data import demo_model_params
from cusmc_tpu.models.dlm import DLM
from cusmc_tpu.smc.enkf import ensemble_kalman_filter
from cusmc_tpu.smc.kalman import kalman_filter


@pytest.fixture(scope="module")
def setup():
    params = demo_model_params(d=2)
    model = DLM.create(noise="mvn", dtype=jnp.float32, **params)
    key = jax.random.key(42)
    _, ys = model.simulate(key, 200)
    ys = jnp.asarray(ys, jnp.float32)
    km, kc, _ = kalman_filter(np.asarray(ys), params["F"], params["G"],
                              params["V"], params["W"],
                              params["m0"], params["C0"])
    return model, ys, np.asarray(km), np.asarray(kc)


class TestEnKF:
    def test_matches_kalman_oracle(self, setup, key):
        model, ys, km, kc = setup
        res = jax.jit(lambda k: ensemble_kalman_filter(
            k, model, ys, num_ensemble=8192))(key)
        means = np.asarray(res.means)
        # Analysis means track the exact filtering means within MC error.
        err = np.abs(means[5:] - km[5:]).mean()
        scale = np.abs(km[5:]).mean() + 1.0
        assert err / scale < 0.05, f"mean err {err} vs scale {scale}"

    def test_ensemble_covariance_matches_kalman(self, setup, key):
        model, ys, km, kc = setup
        res = ensemble_kalman_filter(key, model, ys, num_ensemble=8192)
        ens = np.asarray(res.final_ensemble)
        emp_cov = np.cov(ens.T)
        np.testing.assert_allclose(emp_cov, kc[-1], rtol=0.3, atol=0.02)

    def test_convergence_in_ensemble_size(self, setup, key):
        model, ys, km, _ = setup
        errs = []
        for n in (64, 4096):
            res = ensemble_kalman_filter(jax.random.fold_in(key, n),
                                         model, ys, num_ensemble=n)
            errs.append(np.abs(np.asarray(res.means)[5:] - km[5:]).mean())
        assert errs[1] < errs[0]

    def test_inflation_increases_spread(self, setup, key):
        model, ys, _, _ = setup
        r1 = ensemble_kalman_filter(key, model, ys, 512, inflation=1.0)
        r2 = ensemble_kalman_filter(key, model, ys, 512, inflation=1.3)
        assert float(r2.spread[-1]) > float(r1.spread[-1])

    def test_reproducible_jit(self, setup, key):
        model, ys, _, _ = setup
        r1 = ensemble_kalman_filter(key, model, ys[:50], 128)
        r2 = jax.jit(lambda k: ensemble_kalman_filter(
            k, model, ys[:50], 128))(key)
        np.testing.assert_allclose(np.asarray(r1.final_ensemble),
                                   np.asarray(r2.final_ensemble),
                                   rtol=1e-5, atol=1e-5)


class TestShardedEnKF:
    def test_sharded_matches_oracle_and_replicates(self, setup, key):
        import jax

        from cusmc_tpu.parallel import make_mesh
        from cusmc_tpu.parallel.enkf import sharded_ensemble_kalman_filter

        model, ys, km, _ = setup
        n_dev = len(jax.devices())
        mesh = make_mesh({"particles": n_dev})
        res = sharded_ensemble_kalman_filter(key, model, ys, 1024 * n_dev,
                                             mesh)
        means = np.asarray(res.means)
        err = np.abs(means[5:] - km[5:]).mean()
        scale = np.abs(km[5:]).mean() + 1.0
        assert err / scale < 0.05
        assert res.final_ensemble.shape == (1024 * n_dev, 2)
        assert np.isfinite(float(res.spread[-1]))

    def test_divisibility_check(self, setup, key):
        import jax

        from cusmc_tpu.parallel import make_mesh
        from cusmc_tpu.parallel.enkf import sharded_ensemble_kalman_filter

        model, ys, _, _ = setup
        mesh = make_mesh({"particles": len(jax.devices())})
        if len(jax.devices()) > 1:
            with pytest.raises(ValueError):
                sharded_ensemble_kalman_filter(key, model, ys, 1023, mesh)
