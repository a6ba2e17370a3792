"""Affine-invariant stretch move: no-tuning recovery of correlated and
badly-scaled targets, acceptance sanity, walker-count validation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cusmc_tpu.mcmc import stretch_move_sampler


def test_correlated_gaussian_no_tuning(key):
    # rho=0.9 equicorrelated, scales 1..5 — affine invariance handles
    # both without any proposal tuning
    d, w, steps = 4, 64, 4000
    rho = 0.9
    scales = jnp.asarray([1.0, 2.0, 3.0, 5.0], jnp.float32)
    corr = jnp.full((d, d), rho) + (1 - rho) * jnp.eye(d)
    cov = scales[:, None] * corr * scales[None, :]
    prec = jnp.linalg.inv(cov)
    logp = lambda x: -0.5 * jnp.einsum("wi,ij,wj->w", x, prec, x)
    init = jax.random.normal(key, (w, d), jnp.float32)
    res = jax.jit(lambda k: stretch_move_sampler(
        k, logp, init, steps))(key)
    s = np.asarray(res.samples[steps // 2:]).reshape(-1, d)
    np.testing.assert_allclose(s.mean(0), 0.0, atol=0.5)
    np.testing.assert_allclose(np.cov(s.T), np.asarray(cov),
                               rtol=0.35, atol=0.5)
    assert 0.1 < float(res.accept_rate) < 0.6


def test_reproducible_and_shapes(key):
    d, w = 2, 16
    logp = lambda x: -0.5 * jnp.sum(x * x, axis=-1)
    init = jax.random.normal(key, (w, d), jnp.float32)
    r1 = stretch_move_sampler(key, logp, init, 100, thin=4)
    r2 = jax.jit(lambda k: stretch_move_sampler(
        k, logp, init, 100, thin=4))(key)
    assert r1.samples.shape == (25, w, d)
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r2.x),
                               rtol=2e-5, atol=1e-6)


def test_walker_count_validation(key):
    logp = lambda x: -0.5 * jnp.sum(x * x, axis=-1)
    with pytest.raises(ValueError, match="EVEN walker count"):
        stretch_move_sampler(key, logp, jnp.zeros((7, 2)), 10)
    with pytest.raises(ValueError, match="2d"):
        stretch_move_sampler(key, logp, jnp.zeros((4, 8)), 10)
