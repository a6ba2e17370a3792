"""Closed-form unit tests for the distribution layer (SURVEY.md §4):
normalization constants, scipy cross-checks, and sample moments."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from cusmc_tpu.distributions import (
    MVN,
    MVT,
    make_distribution,
    mvn_logpdf_cov,
    mvn_sample_cov,
    mvt_logpdf_cov,
    mvt_sample_cov,
)
from cusmc_tpu.utils.linalg import cov_sqrt, eigh_sqrt


def random_spd(rng, d):
    a = rng.standard_normal((d, d))
    return a @ a.T + d * np.eye(d)


class TestMVN:
    def test_standard_normal_at_origin(self):
        # 1/(2*pi) = 0.1591549 — the reference's executed sanity example
        # (CuSMC/CuSMC.pdf §2.2; BASELINE.md).
        val = np.exp(mvn_logpdf_cov(jnp.zeros(2), jnp.zeros(2), jnp.eye(2)))
        assert np.isclose(val, 0.15915494, atol=1e-6)

    @pytest.mark.parametrize("d", [1, 2, 5, 16])
    def test_matches_scipy(self, d):
        rng = np.random.default_rng(d)
        mu = rng.standard_normal(d)
        cov = random_spd(rng, d)
        xs = rng.standard_normal((7, d))
        ours = mvn_logpdf_cov(jnp.asarray(xs, jnp.float64),
                              jnp.asarray(mu, jnp.float64),
                              jnp.asarray(cov, jnp.float64))
        ref = stats.multivariate_normal(mu, cov).logpdf(xs)
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)

    def test_sample_moments(self, key):
        d = 3
        rng = np.random.default_rng(0)
        mu = rng.standard_normal(d)
        cov = random_spd(rng, d)
        xs = mvn_sample_cov(key, jnp.asarray(mu, jnp.float32),
                            jnp.asarray(cov, jnp.float32), (200_000,))
        xs = np.asarray(xs)
        np.testing.assert_allclose(xs.mean(0), mu, atol=0.05)
        np.testing.assert_allclose(np.cov(xs.T), cov, atol=0.15, rtol=0.05)

    def test_eigh_sqrt_equivalent(self, key):
        rng = np.random.default_rng(1)
        cov = jnp.asarray(random_spd(rng, 4), jnp.float32)
        q = eigh_sqrt(cov)
        np.testing.assert_allclose(np.asarray(q @ q.T), np.asarray(cov),
                                   rtol=1e-4, atol=1e-4)


class TestMVT:
    @pytest.mark.parametrize("d,df", [(1, 3.0), (2, 4.0), (8, 10.0)])
    def test_matches_scipy(self, d, df):
        rng = np.random.default_rng(d)
        mu = rng.standard_normal(d)
        cov = random_spd(rng, d)
        xs = rng.standard_normal((7, d))
        ours = mvt_logpdf_cov(jnp.asarray(xs, jnp.float64),
                              jnp.asarray(mu, jnp.float64),
                              jnp.asarray(cov, jnp.float64), df)
        ref = stats.multivariate_t(mu, cov, df=df).logpdf(xs)
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)

    def test_sample_moments(self, key):
        # Cov of MVT is df/(df-2) * Sigma.
        d, df = 3, 8.0
        rng = np.random.default_rng(2)
        mu = rng.standard_normal(d)
        cov = random_spd(rng, d)
        xs = mvt_sample_cov(key, jnp.asarray(mu, jnp.float32),
                            jnp.asarray(cov, jnp.float32), df, (400_000,))
        xs = np.asarray(xs)
        np.testing.assert_allclose(xs.mean(0), mu, atol=0.05)
        np.testing.assert_allclose(np.cov(xs.T), df / (df - 2.0) * cov,
                                   atol=0.3, rtol=0.08)

    def test_per_dim_chi_variant_differs(self, key):
        # The reference's nonstandard product-t (statistics.cc.cpp:379-411)
        # has lighter joint tails; check it at least preserves marginal scale.
        d, df = 2, 5.0
        xs = mvt_sample_cov(key, jnp.zeros(d), jnp.eye(d), df, (400_000,),
                            per_dim_chi=True)
        var = np.asarray(xs).var(0)
        np.testing.assert_allclose(var, df / (df - 2.0) * np.ones(d),
                                   rtol=0.05)


class TestRegistry:
    def test_make_and_dispatch(self, key):
        mvn = make_distribution("mvn", np.zeros(2), np.eye(2))
        mvt = make_distribution("mvt", np.zeros(2), np.eye(2), df=4.0)
        assert isinstance(mvn, MVN) and isinstance(mvt, MVT)
        x = mvn.sample(key, (5,))
        assert x.shape == (5, 2)
        assert mvn.log_prob(x).shape == (5,)
        assert mvt.log_prob(x).shape == (5,)

    def test_unknown_raises(self):
        with pytest.raises(KeyError):
            make_distribution("nope", np.zeros(2), np.eye(2))

    def test_jit_through_pytree(self, key):
        mvt = make_distribution("mvt", np.zeros(2), np.eye(2), df=4.0)

        @jax.jit
        def f(dist, x):
            return dist.log_prob(x)

        x = jnp.ones((3, 2))
        np.testing.assert_allclose(np.asarray(f(mvt, x)),
                                   np.asarray(mvt.log_prob(x)), rtol=1e-6)
