"""Tempered SMC sampler tests: moment recovery and evidence estimation on
targets with known normalizing constants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cusmc_tpu.distributions import mvn_logpdf_cov, mvn_sample_cov
from cusmc_tpu.smc.smc_sampler import smc_sampler


def test_shifted_gaussian_target(key):
    # Prior N(0, 4I), target N(mu, I): moments + exact evidence (=1, both
    # normalized) recoverable.
    d = 3
    mu = jnp.asarray([2.0, -1.0, 0.5], jnp.float32)
    prior_cov = 4.0 * jnp.eye(d, dtype=jnp.float32)
    log_prior = lambda x: mvn_logpdf_cov(x, jnp.zeros(d, jnp.float32),
                                         prior_cov)
    log_target = lambda x: mvn_logpdf_cov(x, mu, jnp.eye(d, dtype=jnp.float32))
    prior_sample = lambda k, s: mvn_sample_cov(k, jnp.zeros(d, jnp.float32),
                                               prior_cov, s)
    result = jax.jit(lambda k: smc_sampler(
        k, log_prior, log_target, prior_sample, 4096, d))(key)

    assert int(result.num_stages) >= 2
    w = np.exp(np.asarray(result.log_weights))
    xs = np.asarray(result.particles)
    mean = (w[:, None] * xs).sum(0)
    np.testing.assert_allclose(mean, np.asarray(mu), atol=0.12)
    # Both densities normalized -> log Z ratio = 0.
    assert abs(float(result.log_evidence)) < 0.12


def test_unnormalized_target_evidence(key):
    # Target = c * N(0, I) with log c = 3; evidence estimate must find c.
    d = 2
    log_prior = lambda x: mvn_logpdf_cov(x, jnp.zeros(d, jnp.float32),
                                         jnp.eye(d, dtype=jnp.float32))
    log_target = lambda x: 3.0 + mvn_logpdf_cov(
        x, jnp.zeros(d, jnp.float32), jnp.eye(d, dtype=jnp.float32))
    prior_sample = lambda k, s: jax.random.normal(k, s + (d,), jnp.float32)
    result = smc_sampler(key, log_prior, log_target, prior_sample, 2048, d)
    np.testing.assert_allclose(float(result.log_evidence), 3.0, atol=0.05)
    # Trivial tempering: ESS never drops -> single stage to lambda=1.
    assert int(result.num_stages) == 1


def test_narrow_target_needs_stages(key):
    # Prior N(0, 100 I) -> target N(5, 0.01 I): a hard anneal; the adaptive
    # ladder must use multiple stages and still land on the target.
    d = 2
    prior_cov = 100.0 * jnp.eye(d, dtype=jnp.float32)
    mu = jnp.full((d,), 5.0, jnp.float32)
    log_prior = lambda x: mvn_logpdf_cov(x, jnp.zeros(d, jnp.float32),
                                         prior_cov)
    log_target = lambda x: mvn_logpdf_cov(x, mu,
                                          0.01 * jnp.eye(d, dtype=jnp.float32))
    prior_sample = lambda k, s: mvn_sample_cov(k, jnp.zeros(d, jnp.float32),
                                               prior_cov, s)
    result = smc_sampler(key, log_prior, log_target, prior_sample, 4096, d,
                         rejuvenation_steps=10, step_size=0.1)
    assert int(result.num_stages) > 3
    w = np.exp(np.asarray(result.log_weights))
    mean = (w[:, None] * np.asarray(result.particles)).sum(0)
    np.testing.assert_allclose(mean, np.asarray(mu), atol=0.1)
    assert abs(float(result.log_evidence)) < 0.5


def test_resampler_options(key):
    d = 2
    log_prior = lambda x: mvn_logpdf_cov(x, jnp.zeros(d, jnp.float32),
                                         4.0 * jnp.eye(d, dtype=jnp.float32))
    log_target = lambda x: mvn_logpdf_cov(x, jnp.ones(d, jnp.float32),
                                          jnp.eye(d, dtype=jnp.float32))
    prior_sample = lambda k, s: 2.0 * jax.random.normal(k, s + (d,),
                                                        jnp.float32)
    for name in ("systematic", "metropolis", "multinomial"):
        result = smc_sampler(key, log_prior, log_target, prior_sample,
                             1024, d, resampler=name)
        assert np.isfinite(float(result.log_evidence))


def test_mala_rejuvenation(key):
    # Same shifted-Gaussian setup, MALA move kernel: moments + evidence.
    d = 3
    mu = jnp.asarray([2.0, -1.0, 0.5], jnp.float32)
    prior_cov = 4.0 * jnp.eye(d, dtype=jnp.float32)
    log_prior = lambda x: mvn_logpdf_cov(x, jnp.zeros(d, jnp.float32),
                                         prior_cov)
    log_target = lambda x: mvn_logpdf_cov(x, mu, jnp.eye(d, dtype=jnp.float32))
    prior_sample = lambda k, s: mvn_sample_cov(k, jnp.zeros(d, jnp.float32),
                                               prior_cov, s)
    result = jax.jit(lambda k: smc_sampler(
        k, log_prior, log_target, prior_sample, 4096, d,
        rejuvenation="mala", step_size=0.3))(key)
    w = np.exp(np.asarray(result.log_weights))
    xs = np.asarray(result.particles)
    mean = (w[:, None] * xs).sum(0)
    np.testing.assert_allclose(mean, np.asarray(mu), atol=0.12)
    assert abs(float(result.log_evidence)) < 0.12


def test_hmc_rejuvenation(key):
    # Correlated target: 5-leapfrog HMC moves cross the ridge that traps
    # a random-walk sweep; moments + evidence recovered.
    d = 3
    mu = jnp.asarray([2.0, -1.0, 0.5], jnp.float32)
    rho = 0.9
    tcov = jnp.asarray(np.eye(d) * (1 - rho) + rho, jnp.float32)
    prior_cov = 4.0 * jnp.eye(d, dtype=jnp.float32)
    log_prior = lambda x: mvn_logpdf_cov(x, jnp.zeros(d, jnp.float32),
                                         prior_cov)
    log_target = lambda x: mvn_logpdf_cov(x, mu, tcov)
    prior_sample = lambda k, s: mvn_sample_cov(k, jnp.zeros(d, jnp.float32),
                                               prior_cov, s)
    result = jax.jit(lambda k: smc_sampler(
        k, log_prior, log_target, prior_sample, 4096, d,
        rejuvenation="hmc", step_size=0.25))(key)
    w = np.exp(np.asarray(result.log_weights))
    xs = np.asarray(result.particles)
    mean = (w[:, None] * xs).sum(0)
    np.testing.assert_allclose(mean, np.asarray(mu), atol=0.15)
    assert abs(float(result.log_evidence)) < 0.15
    assert float(result.accept_rate) > 0.5


def test_unknown_rejuvenation_rejected(key):
    d = 2
    lp = lambda x: mvn_logpdf_cov(x, jnp.zeros(d, jnp.float32),
                                  jnp.eye(d, dtype=jnp.float32))
    ps = lambda k, s: jax.random.normal(k, s + (d,), jnp.float32)
    with pytest.raises(ValueError):
        smc_sampler(key, lp, lp, ps, 64, d, rejuvenation="nuts")


@pytest.mark.parametrize("kernel", ["rwm", "mala", "hmc"])
def test_waste_free(key, kernel):
    # Dau-Chopin waste-free resample-move: same shifted-Gaussian oracle.
    d = 3
    mu = jnp.asarray([2.0, -1.0, 0.5], jnp.float32)
    prior_cov = 4.0 * jnp.eye(d, dtype=jnp.float32)
    log_prior = lambda x: mvn_logpdf_cov(x, jnp.zeros(d, jnp.float32),
                                         prior_cov)
    log_target = lambda x: mvn_logpdf_cov(x, mu, jnp.eye(d, dtype=jnp.float32))
    prior_sample = lambda k, s: mvn_sample_cov(k, jnp.zeros(d, jnp.float32),
                                               prior_cov, s)
    result = jax.jit(lambda k: smc_sampler(
        k, log_prior, log_target, prior_sample, 4096, d,
        rejuvenation=kernel, waste_free=True, rejuvenation_steps=8,
        step_size=0.3))(key)
    w = np.exp(np.asarray(result.log_weights))
    xs = np.asarray(result.particles)
    assert xs.shape == (4096, d)
    mean = (w[:, None] * xs).sum(0)
    np.testing.assert_allclose(mean, np.asarray(mu), atol=0.15)
    assert abs(float(result.log_evidence)) < 0.15


def test_waste_free_divisibility(key):
    d = 2
    lp = lambda x: mvn_logpdf_cov(x, jnp.zeros(d, jnp.float32),
                                  jnp.eye(d, dtype=jnp.float32))
    ps = lambda k, s: jax.random.normal(k, s + (d,), jnp.float32)
    with pytest.raises(ValueError):
        smc_sampler(key, lp, lp, ps, 100, d, waste_free=True,
                    rejuvenation_steps=7)
