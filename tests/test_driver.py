"""Convergence-driven sampling driver: stops when diagnostics pass,
flags non-convergence, reuses compiled blocks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cusmc_tpu.mcmc import sample_to_convergence


def test_chees_converges_fast(key):
    d, chains = 4, 64
    stds = jnp.asarray([1.0, 2.0, 4.0, 8.0], jnp.float32)
    logp = lambda x: -0.5 * jnp.sum((x / stds) ** 2, axis=-1)
    init = stds * jax.random.normal(key, (chains, d), jnp.float32)
    run = sample_to_convergence(key, logp, init, sampler="chees",
                                block_steps=300, max_blocks=10,
                                min_ess=400.0, step_size=0.3,
                                init_traj=0.6)
    assert run.converged
    assert run.blocks <= 5
    assert run.rhat.max() <= 1.01
    assert run.ess.min() >= 400
    s = run.samples.reshape(-1, d)
    np.testing.assert_allclose(s.var(0), np.asarray(stds) ** 2, rtol=0.4)


def test_mh_flags_nonconvergence(key):
    # an impossibly tight ESS demand within 2 tiny blocks -> not converged
    d, chains = 2, 8
    logp = lambda x: -0.5 * jnp.sum(x * x, axis=-1)
    init = jax.random.normal(key, (chains, d), jnp.float32)
    run = sample_to_convergence(key, logp, init, sampler="mh",
                                block_steps=50, max_blocks=2,
                                min_ess=1e6)
    assert not run.converged
    assert run.blocks == 2
    assert run.samples.shape == (100, chains, d)


def test_mh_converges_on_easy_target(key):
    d, chains = 2, 64
    logp = lambda x: -0.5 * jnp.sum(x * x, axis=-1)
    init = jax.random.normal(key, (chains, d), jnp.float32)
    run = sample_to_convergence(key, logp, init, sampler="mh",
                                block_steps=400, max_blocks=10,
                                min_ess=300.0, step_size=1.0)
    assert run.converged
    s = run.samples.reshape(-1, d)
    np.testing.assert_allclose(s.var(0), 1.0, rtol=0.3)


def test_unknown_sampler(key):
    with pytest.raises(ValueError, match="unknown sampler"):
        sample_to_convergence(key, lambda x: x.sum(-1),
                              jnp.zeros((4, 2)), sampler="gibbs")


def test_pt_driver_on_bimodal(key):
    # plain-MH driver would satisfy R-hat while stuck in one mode only
    # if chains all start together; PT actually mixes the modes.
    SEP = 4.0

    def mix(x):
        a = -0.5 * jnp.sum((x + SEP) ** 2, axis=-1)
        b = -0.5 * jnp.sum((x - SEP) ** 2, axis=-1)
        return jnp.logaddexp(a, b)

    init = -SEP + 0.5 * jax.random.normal(key, (32, 2), jnp.float32)
    run = sample_to_convergence(key, mix, init, sampler="pt",
                                block_steps=800, max_blocks=8,
                                min_ess=300.0, step_size=0.6,
                                num_rungs=6, beta_min=0.02,
                                adapt_ladder=True)
    assert run.converged
    frac = float((run.samples[..., 0] > 0).mean())
    assert 0.2 < frac < 0.8


def test_stretch_driver(key):
    d, walkers = 3, 64
    stds = jnp.asarray([1.0, 3.0, 9.0], jnp.float32)
    logp = lambda x: -0.5 * jnp.sum((x / stds) ** 2, axis=-1)
    init = stds * jax.random.normal(key, (walkers, d), jnp.float32)
    run = sample_to_convergence(key, logp, init, sampler="stretch",
                                block_steps=600, max_blocks=10,
                                min_ess=300.0)
    assert run.converged
    s = run.samples.reshape(-1, d)
    np.testing.assert_allclose(s.var(0), np.asarray(stds) ** 2,
                               rtol=0.4)
