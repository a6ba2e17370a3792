"""MALA and adaptive-Metropolis tests: moment recovery, detailed-balance
sanity via a correlated target, adaptation behavior, reproducibility."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cusmc_tpu.distributions import mvn_logpdf_cov
from cusmc_tpu.mcmc import adaptive_mh_sampler, mala_sampler


def correlated_gaussian(d=4, rho=0.8, seed=0):
    rng = np.random.default_rng(seed)
    mu = rng.standard_normal(d).astype(np.float32)
    cov = (rho * np.ones((d, d)) + (1 - rho) * np.eye(d)).astype(np.float32)
    logp = lambda x: mvn_logpdf_cov(x, jnp.asarray(mu), jnp.asarray(cov))
    return mu, cov, logp


class TestMALA:
    def test_mvn_target_moments(self, key):
        d, chains, steps = 4, 64, 3000
        mu, cov, logp = correlated_gaussian(d)
        init = jax.random.normal(key, (chains, d), jnp.float32)
        res = jax.jit(lambda k: mala_sampler(k, logp, init, steps))(key)
        samples = np.asarray(res.samples[steps // 2:]).reshape(-1, d)
        np.testing.assert_allclose(samples.mean(0), mu, atol=0.15)
        np.testing.assert_allclose(np.cov(samples.T), cov, atol=0.35)

    def test_adaptation_hits_target(self, key):
        d, chains, steps = 8, 32, 2000
        _, _, logp = correlated_gaussian(d, rho=0.0)
        init = jnp.zeros((chains, d), jnp.float32)
        res = mala_sampler(key, logp, init, steps, step_size=1e-3,
                           adapt_rate=0.1)
        # Second-half acceptance should sit near the MALA optimum 0.574.
        assert 0.35 < float(res.accept_rate) < 0.85

    def test_beats_rwm_mixing_on_narrow_target(self, key):
        # On a well-conditioned Gaussian, MALA's effective step is larger:
        # lag-1 autocorrelation of the chain mean should be lower than RWM's
        # at matched acceptance. Smoke-level check: MALA moves further.
        from cusmc_tpu.mcmc import metropolis_hastings_sampler

        d, chains, steps = 16, 16, 800
        _, _, logp = correlated_gaussian(d, rho=0.0)
        init = jnp.zeros((chains, d), jnp.float32)
        mala = mala_sampler(key, logp, init, steps)
        rwm = metropolis_hastings_sampler(key, logp, init, steps)
        sq_jump = lambda s: float(np.mean(np.sum(np.diff(
            np.asarray(s.samples[steps // 2:]), axis=0) ** 2, axis=-1)))
        assert sq_jump(mala) > sq_jump(rwm)

    def test_reproducible_jit(self, key):
        d = 3
        _, _, logp = correlated_gaussian(d)
        init = jnp.ones((4, d), jnp.float32)
        r1 = mala_sampler(key, logp, init, 150)
        r2 = jax.jit(lambda k: mala_sampler(k, logp, init, 150))(key)
        np.testing.assert_allclose(np.asarray(r1.state.x),
                                   np.asarray(r2.state.x),
                                   rtol=1e-5, atol=1e-5)


class TestAdaptiveMH:
    def test_learns_correlated_covariance(self, key):
        # Strongly correlated target: AM must learn the off-diagonal
        # structure; its learned proposal covariance should show the same
        # correlation sign/pattern as the target.
        d, chains, steps = 4, 128, 3000
        mu, cov, logp = correlated_gaussian(d, rho=0.85, seed=1)
        init = jax.random.normal(key, (chains, d), jnp.float32)
        res = jax.jit(lambda k: adaptive_mh_sampler(k, logp, init, steps))(key)
        samples = np.asarray(res.samples[steps // 2:]).reshape(-1, d)
        np.testing.assert_allclose(samples.mean(0), mu, atol=0.2)
        np.testing.assert_allclose(np.cov(samples.T), cov, atol=0.4)
        learned = np.asarray(res.proposal_cov) / (2.38**2 / d)
        corr = learned / np.sqrt(np.outer(np.diag(learned),
                                          np.diag(learned)))
        assert corr[0, 1] > 0.4  # target rho = 0.85

    def test_acceptance_near_target(self, key):
        d, chains, steps = 8, 64, 2500
        _, _, logp = correlated_gaussian(d, rho=0.5, seed=2)
        init = jax.random.normal(key, (chains, d), jnp.float32)
        res = adaptive_mh_sampler(key, logp, init, steps)
        assert 0.1 < float(res.accept_rate) < 0.45

    def test_freeze_after_adapt(self, key):
        d = 2
        _, _, logp = correlated_gaussian(d, rho=0.0)
        init = jnp.zeros((8, d), jnp.float32)
        res = adaptive_mh_sampler(key, logp, init, 400, num_adapt=100)
        # count only absorbs adaptation-phase samples: (1 init + 100) * C.
        assert float(res.state.count) == pytest.approx(101 * 8)

    def test_no_samples_and_reproducible(self, key):
        d = 3
        _, _, logp = correlated_gaussian(d)
        init = jnp.ones((4, d), jnp.float32)
        r1 = adaptive_mh_sampler(key, logp, init, 120, keep_samples=False)
        assert r1.samples is None
        r2 = jax.jit(lambda k: adaptive_mh_sampler(
            k, logp, init, 120, keep_samples=False))(key)
        np.testing.assert_allclose(np.asarray(r1.state.x),
                                   np.asarray(r2.state.x),
                                   rtol=1e-5, atol=1e-5)


class TestHMC:
    def test_mvn_target_moments(self, key):
        from cusmc_tpu.mcmc import hmc_sampler

        d, chains, steps = 8, 64, 1500
        mu, cov, logp = correlated_gaussian(d, rho=0.7, seed=4)
        init = jax.random.normal(key, (chains, d), jnp.float32)
        res = jax.jit(lambda k: hmc_sampler(k, logp, init, steps))(key)
        samples = np.asarray(res.samples[steps // 2:]).reshape(-1, d)
        np.testing.assert_allclose(samples.mean(0), mu, atol=0.15)
        np.testing.assert_allclose(np.cov(samples.T), cov, atol=0.4)
        assert 0.5 < float(res.accept_rate) <= 1.0

    def test_beats_mala_squared_jump(self, key):
        from cusmc_tpu.mcmc import hmc_sampler, mala_sampler

        d, chains, steps = 32, 16, 600
        _, _, logp = correlated_gaussian(d, rho=0.0, seed=5)
        init = jnp.zeros((chains, d), jnp.float32)
        hmc = hmc_sampler(key, logp, init, steps, num_leapfrog=16)
        mala = mala_sampler(key, logp, init, steps)
        sq = lambda s: float(np.mean(np.sum(np.diff(
            np.asarray(s.samples[steps // 2:]), axis=0) ** 2, axis=-1)))
        assert sq(hmc) > sq(mala)

    def test_reproducible_jit_and_no_jitter(self, key):
        from cusmc_tpu.mcmc import hmc_sampler

        d = 3
        _, _, logp = correlated_gaussian(d)
        init = jnp.ones((4, d), jnp.float32)
        r1 = hmc_sampler(key, logp, init, 100, jitter=False)
        r2 = jax.jit(lambda k: hmc_sampler(k, logp, init, 100,
                                           jitter=False))(key)
        np.testing.assert_allclose(np.asarray(r1.state.x),
                                   np.asarray(r2.state.x),
                                   rtol=1e-5, atol=1e-5)


class TestCholEvery:
    """Round 5: blocked proposal-factor refresh (nested scan). The
    running moments absorb every sweep; only the Cholesky lags — the
    sampler must still learn the target and hit the acceptance target."""

    def test_moments_with_blocked_refresh(self, key):
        d, chains, steps = 3, 64, 3000
        rng = np.random.default_rng(11)
        mu = jnp.asarray(rng.standard_normal(d), jnp.float32)
        cov = jnp.asarray(np.diag([1.0, 4.0, 0.25]), jnp.float32)
        logp = lambda x: mvn_logpdf_cov(x, mu, cov)
        init = mu + jax.random.normal(key, (chains, d), jnp.float32)
        res = jax.jit(lambda k: adaptive_mh_sampler(
            k, logp, init, steps, chol_every=25))(key)
        samples = np.asarray(res.samples[steps // 2:]).reshape(-1, d)
        np.testing.assert_allclose(samples.mean(0), np.asarray(mu),
                                   atol=0.3)
        np.testing.assert_allclose(samples.var(0), [1.0, 4.0, 0.25],
                                   rtol=0.35)
        assert 0.1 < float(res.accept_rate) < 0.45

    def test_sample_stream_shape_and_continuity(self, key):
        # [B, E, ...] outputs reshape back to one [T, C, d] stream.
        d, chains = 2, 8
        logp = lambda x: -0.5 * jnp.sum(x * x, axis=-1)
        init = jax.random.normal(key, (chains, d), jnp.float32)
        res = adaptive_mh_sampler(key, logp, init, 40, chol_every=10)
        assert res.samples.shape == (40, chains, d)
        # consecutive states differ only by accepted moves (no block
        # boundary artifacts): every row equals prev or a fresh proposal
        diffs = np.diff(np.asarray(res.samples), axis=0)
        assert np.isfinite(diffs).all()

    def test_indivisible_raises(self, key):
        logp = lambda x: -0.5 * jnp.sum(x * x, axis=-1)
        init = jnp.zeros((4, 2), jnp.float32)
        with pytest.raises(ValueError, match="multiple of"):
            adaptive_mh_sampler(key, logp, init, 41, chol_every=10)
