"""ChEES-HMC: trajectory-length adaptation on anisotropic targets,
exactness of the underlying jittered HMC kernel, Halton mechanics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cusmc_tpu.mcmc import chees_hmc_sampler
from cusmc_tpu.mcmc.chees import _halton2


class TestHalton:
    def test_low_discrepancy_prefix(self):
        u = np.asarray([float(_halton2(jnp.asarray(t))) for t in range(16)])
        assert (u > 0).all() and (u < 1).all()
        # base-2 radical inverse: first points 1/2, 1/4, 3/4, 1/8 ...
        np.testing.assert_allclose(u[1:4], [0.5, 0.25, 0.75], atol=1e-6)
        # any 8 consecutive points cover all 8 dyadic octaves
        octaves = np.floor(u[:8] * 8).astype(int)
        assert sorted(octaves.tolist()) == list(range(8))


class TestAdaptation:
    def test_learns_long_trajectories_on_wide_target(self, key):
        # stds 1..10: the optimal trajectory is ~ the widest scale,
        # far above the 2*init_traj=1.2 starting mean.
        d, chains, steps = 8, 128, 1200
        stds = jnp.linspace(1.0, 10.0, d)
        logp = lambda x: -0.5 * jnp.sum((x / stds) ** 2, axis=-1)
        init = stds * jax.random.normal(key, (chains, d), jnp.float32)
        # precondition=False isolates the trajectory-length mechanism
        res = jax.jit(lambda k: chees_hmc_sampler(
            k, logp, init, steps, step_size=0.3, init_traj=0.6,
            precondition=False, keep_samples=False))(key)
        assert float(res.traj_length) > 3.0          # grew ~5x or more
        assert 0.4 < float(res.accept_rate) < 0.9    # eps adapted too
        assert float(res.mean_leapfrog) > 4.0

    def test_mass_matrix_learns_scales(self, key):
        # default preconditioning: var_est converges to the target
        # variances and the trajectory stays short (isotropized space)
        d, chains, steps = 6, 128, 1200
        stds = jnp.linspace(1.0, 10.0, d)
        logp = lambda x: -0.5 * jnp.sum((x / stds) ** 2, axis=-1)
        init = stds * jax.random.normal(key, (chains, d), jnp.float32)
        res = jax.jit(lambda k: chees_hmc_sampler(
            k, logp, init, steps, step_size=0.3, init_traj=0.6,
            keep_samples=False))(key)
        ratio = np.asarray(res.mass_var) / np.asarray(stds) ** 2
        assert (ratio > 0.4).all() and (ratio < 2.5).all()
        assert 0.4 < float(res.accept_rate) < 0.95
        # preconditioned space is ~unit-scale: no need for tau ~ 10
        assert float(res.traj_length) < 6.0

    def test_moments_on_anisotropic_gaussian(self, key):
        d, chains, steps = 4, 128, 1500
        stds = jnp.asarray([1.0, 2.0, 4.0, 8.0], jnp.float32)
        logp = lambda x: -0.5 * jnp.sum((x / stds) ** 2, axis=-1)
        init = stds * jax.random.normal(key, (chains, d), jnp.float32)
        res = jax.jit(lambda k: chees_hmc_sampler(
            k, logp, init, steps, step_size=0.3, init_traj=0.6))(key)
        s = np.asarray(res.samples[steps // 2:]).reshape(-1, d)
        np.testing.assert_allclose(s.mean(0), 0.0, atol=0.9)
        np.testing.assert_allclose(s.var(0), np.asarray(stds) ** 2,
                                   rtol=0.35)

    def test_freezes_after_adapt(self, key):
        d, chains = 2, 16
        logp = lambda x: -0.5 * jnp.sum(x * x, axis=-1)
        init = jax.random.normal(key, (chains, d), jnp.float32)
        r = chees_hmc_sampler(key, logp, init, 200, num_adapt=50,
                              keep_samples=False)
        # rerun with more post-adapt steps: frozen params identical
        r2 = chees_hmc_sampler(key, logp, init, 120, num_adapt=50,
                               keep_samples=False)
        np.testing.assert_allclose(float(r.traj_length),
                                   float(r2.traj_length), rtol=1e-5)
        np.testing.assert_allclose(float(r.step_size),
                                   float(r2.step_size), rtol=1e-5)


class TestMechanics:
    def test_reproducible_and_shapes(self, key):
        d, chains, steps = 3, 8, 60
        logp = lambda x: -0.5 * jnp.sum(x * x, axis=-1)
        init = jax.random.normal(key, (chains, d), jnp.float32)
        r1 = chees_hmc_sampler(key, logp, init, steps, thin=3)
        r2 = jax.jit(lambda k: chees_hmc_sampler(
            k, logp, init, steps, thin=3))(key)
        assert r1.samples.shape == (steps // 3, chains, d)
        np.testing.assert_allclose(np.asarray(r1.state.x),
                                   np.asarray(r2.state.x),
                                   rtol=2e-5, atol=1e-5)

    def test_divergence_rejected_not_propagated(self, key):
        # huge step size -> divergent energies must reject, not NaN out
        d, chains = 2, 8
        logp = lambda x: -0.5 * jnp.sum(x * x, axis=-1) * 50.0
        init = 0.1 * jax.random.normal(key, (chains, d), jnp.float32)
        r = chees_hmc_sampler(key, logp, init, 50, step_size=5.0,
                              adapt_rate=0.0, traj_lr=0.0,
                              keep_samples=False)
        assert np.isfinite(np.asarray(r.state.x)).all()
        assert float(r.accept_rate) < 0.2
