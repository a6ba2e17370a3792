"""Parallel tempering: multimodal recovery (the capability plain MH
lacks), cold-chain exactness on unimodal targets, DEO swap mechanics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cusmc_tpu.mcmc import (
    geometric_ladder,
    metropolis_hastings_sampler,
    parallel_tempering_sampler,
)

SEP = 4.0


def mixture_logprob(x):
    """Equal mixture of N(-SEP*1, I) and N(+SEP*1, I) in d dims."""
    d = x.shape[-1]
    a = -0.5 * jnp.sum((x + SEP) ** 2, axis=-1)
    b = -0.5 * jnp.sum((x - SEP) ** 2, axis=-1)
    return jnp.logaddexp(a, b) - jnp.log(2.0) - 0.5 * d * jnp.log(2 * jnp.pi)


class TestLadder:
    def test_geometric_endpoints(self):
        b = np.asarray(geometric_ladder(6, 0.05))
        assert b[0] == 1.0
        np.testing.assert_allclose(b[-1], 0.05, rtol=1e-6)
        assert (np.diff(b) < 0).all()

    def test_single_rung(self):
        assert geometric_ladder(1).shape == (1,)


class TestBimodal:
    def test_pt_crosses_modes_plain_mh_does_not(self, key):
        d, chains, steps = 2, 32, 3000
        # every chain starts in the LEFT mode
        init = -SEP + 0.5 * jax.random.normal(key, (chains, d), jnp.float32)

        mh = jax.jit(lambda k: metropolis_hastings_sampler(
            k, mixture_logprob, init, steps, step_size=0.6,
            adapt_rate=0.0))(key)
        mh_frac_right = float(
            (np.asarray(mh.samples[steps // 2:, :, 0]) > 0).mean())

        pt = jax.jit(lambda k: parallel_tempering_sampler(
            k, mixture_logprob, init, steps, num_rungs=8, beta_min=0.02,
            step_size=0.6))(key)
        pt_frac_right = float(
            (np.asarray(pt.samples[steps // 2:, :, 0]) > 0).mean())

        # plain MH stays stuck in the start mode; PT balances ~50/50
        assert mh_frac_right < 0.05
        assert 0.30 < pt_frac_right < 0.70

    def test_cold_marginal_moments(self, key):
        # mixture mean 0, per-coordinate variance 1 + SEP^2
        d, chains, steps = 2, 64, 4000
        init = -SEP + 0.5 * jax.random.normal(key, (chains, d), jnp.float32)
        pt = jax.jit(lambda k: parallel_tempering_sampler(
            k, mixture_logprob, init, steps, num_rungs=8, beta_min=0.02,
            step_size=0.6))(key)
        s = np.asarray(pt.samples[steps // 2:]).reshape(-1, d)
        np.testing.assert_allclose(s.mean(0), 0.0, atol=1.2)
        np.testing.assert_allclose(s.var(0), 1.0 + SEP ** 2, rtol=0.35)


class TestMechanics:
    def test_unimodal_exactness(self, key):
        # tempering must not perturb a unimodal target's cold chain
        d, chains, steps = 3, 64, 3000
        logp = lambda x: -0.5 * jnp.sum((x - 1.5) ** 2, axis=-1) / 0.49
        init = jax.random.normal(key, (chains, d), jnp.float32)
        pt = jax.jit(lambda k: parallel_tempering_sampler(
            k, logp, init, steps, num_rungs=4, beta_min=0.2,
            step_size=0.4))(key)
        s = np.asarray(pt.samples[steps // 2:]).reshape(-1, d)
        np.testing.assert_allclose(s.mean(0), 1.5, atol=0.15)
        np.testing.assert_allclose(s.var(0), 0.49, rtol=0.3)

    def test_swap_rates_and_shapes(self, key):
        d, chains, steps, R = 2, 16, 400, 6
        init = jax.random.normal(key, (chains, d), jnp.float32)
        logp = lambda x: -0.5 * jnp.sum(x * x, axis=-1)
        pt = parallel_tempering_sampler(key, logp, init, steps,
                                        num_rungs=R, beta_min=0.1)
        assert pt.samples.shape == (steps, chains, d)
        assert pt.swap_rate.shape == (R - 1,)
        assert pt.accept_rate.shape == (R,)
        sw = np.asarray(pt.swap_rate)
        assert (sw > 0.05).all() and (sw <= 1.0).all()
        assert np.asarray(pt.betas)[0] == 1.0

    def test_reproducible_and_no_samples(self, key):
        d, chains = 2, 8
        logp = lambda x: -0.5 * jnp.sum(x * x, axis=-1)
        init = jax.random.normal(key, (chains, d), jnp.float32)
        r1 = parallel_tempering_sampler(key, logp, init, 100,
                                        num_rungs=4, keep_samples=False)
        r2 = jax.jit(lambda k: parallel_tempering_sampler(
            k, logp, init, 100, num_rungs=4, keep_samples=False))(key)
        assert r1.samples is None
        np.testing.assert_allclose(np.asarray(r1.state.x),
                                   np.asarray(r2.state.x), rtol=2e-5,
                                   atol=1e-5)

    def test_swap_every_and_custom_betas(self, key):
        d, chains = 2, 8
        logp = lambda x: -0.5 * jnp.sum(x * x, axis=-1)
        init = jax.random.normal(key, (chains, d), jnp.float32)
        betas = jnp.asarray([1.0, 0.5, 0.25], jnp.float32)
        pt = parallel_tempering_sampler(key, logp, init, 120, betas=betas,
                                        swap_every=3)
        assert pt.swap_rate.shape == (2,)
        assert np.isfinite(np.asarray(pt.swap_rate)).all()

    def test_init_rung_mismatch_raises(self, key):
        logp = lambda x: -0.5 * jnp.sum(x * x, axis=-1)
        init = jnp.zeros((3, 8, 2), jnp.float32)
        with pytest.raises(ValueError, match="rung axis"):
            parallel_tempering_sampler(key, logp, init, 10, num_rungs=4)


class TestAdaptiveLadder:
    def test_equalizes_swap_rates(self, key):
        # a badly-spaced initial ladder: most gap between rungs 0-1.
        d, chains, steps = 2, 64, 3000
        betas0 = jnp.asarray([1.0, 0.05, 0.03, 0.02], jnp.float32)
        logp = lambda x: -0.5 * jnp.sum(x * x, axis=-1) * 50.0
        init = jax.random.normal(key, (chains, d), jnp.float32) * 0.14
        fixed = jax.jit(lambda k: parallel_tempering_sampler(
            k, logp, init, steps, betas=betas0, step_size=0.05))(key)
        adapt = jax.jit(lambda k: parallel_tempering_sampler(
            k, logp, init, steps, betas=betas0, step_size=0.05,
            adapt_ladder=True))(key)
        sw_f = np.asarray(fixed.swap_rate)
        sw_a = np.asarray(adapt.swap_rate)
        # adapted ladder's swap rates are materially more uniform
        assert sw_a.std() < 0.7 * sw_f.std(), (sw_f, sw_a)
        b = np.asarray(adapt.betas)
        # endpoints pinned, interior monotone
        assert b[0] == 1.0
        np.testing.assert_allclose(b[-1], 0.02, rtol=1e-4)
        assert (np.diff(b) < 0).all()

    def test_default_ladder_unchanged_without_flag(self, key):
        d, chains = 2, 16
        logp = lambda x: -0.5 * jnp.sum(x * x, axis=-1)
        init = jax.random.normal(key, (chains, d), jnp.float32)
        r = parallel_tempering_sampler(key, logp, init, 50, num_rungs=4)
        np.testing.assert_allclose(
            np.asarray(r.betas),
            np.asarray(jnp.asarray([1.0, 0.1 ** (1 / 3), 0.1 ** (2 / 3),
                                    0.1], jnp.float32)), rtol=1e-5)

    def test_bimodal_still_recovered_with_adaptation(self, key):
        d, chains, steps = 2, 32, 3000
        SEP = 4.0

        def mix(x):
            a = -0.5 * jnp.sum((x + SEP) ** 2, axis=-1)
            b = -0.5 * jnp.sum((x - SEP) ** 2, axis=-1)
            return jnp.logaddexp(a, b)

        init = -SEP + 0.5 * jax.random.normal(key, (chains, d),
                                              jnp.float32)
        pt = jax.jit(lambda k: parallel_tempering_sampler(
            k, mix, init, steps, num_rungs=8, beta_min=0.02,
            step_size=0.6, adapt_ladder=True))(key)
        frac = float((np.asarray(pt.samples[steps // 2:, :, 0]) > 0)
                     .mean())
        assert 0.25 < frac < 0.75
