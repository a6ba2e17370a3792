"""Split R-hat and multi-chain autocorrelation ESS: calibration against
known processes (iid, AR(1) with closed-form ESS, unmixed chains)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cusmc_tpu.diagnostics import (
    effective_sample_size_chains,
    mcmc_summary,
    split_rhat,
)


class TestRhat:
    def test_iid_near_one(self):
        rng = np.random.default_rng(0)
        s = jnp.asarray(rng.standard_normal((2000, 8)), jnp.float32)
        r = float(split_rhat(s))
        assert 0.99 < r < 1.01

    def test_unmixed_chains_flagged(self):
        rng = np.random.default_rng(1)
        s = rng.standard_normal((1000, 4)).astype(np.float32)
        s[:, 0] += 5.0  # one chain stuck elsewhere
        assert float(split_rhat(jnp.asarray(s))) > 1.5

    def test_within_chain_drift_flagged(self):
        # split-R-hat catches a trend even with identical chain means
        rng = np.random.default_rng(2)
        t = np.linspace(-3, 3, 2000)[:, None]
        s = t + 0.1 * rng.standard_normal((2000, 4))
        assert float(split_rhat(jnp.asarray(s, jnp.float32))) > 1.5

    def test_vector_dims(self):
        rng = np.random.default_rng(3)
        s = jnp.asarray(rng.standard_normal((500, 4, 3)), jnp.float32)
        assert split_rhat(s).shape == (3,)


class TestESS:
    def test_iid_ess_near_total(self):
        rng = np.random.default_rng(4)
        t, c = 2000, 8
        s = jnp.asarray(rng.standard_normal((t, c)), jnp.float32)
        ess = float(effective_sample_size_chains(s))
        assert 0.5 * t * c < ess <= 1.5 * t * c

    @pytest.mark.parametrize("phi", [0.5, 0.9])
    def test_ar1_matches_theory(self, phi):
        # AR(1): tau = (1+phi)/(1-phi), ESS = N / tau
        rng = np.random.default_rng(5)
        t, c = 4000, 8
        e = rng.standard_normal((t, c))
        x = np.zeros((t, c))
        for i in range(1, t):
            x[i] = phi * x[i - 1] + np.sqrt(1 - phi * phi) * e[i]
        ess = float(effective_sample_size_chains(
            jnp.asarray(x, jnp.float32)))
        expect = t * c * (1 - phi) / (1 + phi)
        assert 0.5 * expect < ess < 2.0 * expect

    def test_jit_and_summary(self):
        rng = np.random.default_rng(6)
        s = jnp.asarray(rng.standard_normal((400, 4, 2)), jnp.float32)
        out = jax.jit(mcmc_summary)(s)
        assert out["mean"].shape == (2,)
        assert np.all(np.asarray(out["rhat"]) < 1.05)
        assert np.all(np.asarray(out["ess"]) > 100)
        assert np.all(np.asarray(out["ess_per_draw"]) <= 1.5)

    def test_sampler_integration(self, key):
        # the real consumer: MH output [T, C, d]
        from cusmc_tpu.mcmc import metropolis_hastings_sampler
        logp = lambda x: -0.5 * jnp.sum(x * x, axis=-1)
        init = jax.random.normal(key, (16, 2), jnp.float32)
        r = metropolis_hastings_sampler(key, logp, init, 1000,
                                        step_size=1.2)
        out = mcmc_summary(r.samples[200:])
        assert np.all(np.asarray(out["rhat"]) < 1.1)
        # RW-MH at 0.234 acceptance mixes slowly: ESS well under total
        assert np.all(np.asarray(out["ess"]) < 1000 * 16)
        assert np.all(np.asarray(out["ess"]) > 50)


class TestRankNormalized:
    """Vehtari-recommendation extras: rank-normalized folded R-hat and
    tail ESS."""

    def test_heavy_tail_robustness(self):
        # cauchy draws: plain split_rhat is noise-dominated, the
        # rank-normalized version stays calibrated near 1 for iid chains
        from cusmc_tpu.diagnostics import rank_normalized_rhat
        rng = np.random.default_rng(7)
        s = jnp.asarray(rng.standard_cauchy((2000, 8)), jnp.float32)
        assert 0.99 < float(rank_normalized_rhat(s)) < 1.02

    def test_scale_disagreement_flagged(self):
        # same mean, different variances: plain split-rhat (mean-based)
        # misses it, the folded component catches it
        from cusmc_tpu.diagnostics import rank_normalized_rhat, split_rhat
        rng = np.random.default_rng(8)
        s = rng.standard_normal((2000, 4)).astype(np.float32)
        s[:, 0] *= 6.0
        assert float(split_rhat(jnp.asarray(s))) < 1.1
        assert float(rank_normalized_rhat(jnp.asarray(s))) > 1.2

    def test_tail_ess_iid(self):
        from cusmc_tpu.diagnostics import ess_tail
        rng = np.random.default_rng(9)
        t, c = 2000, 8
        s = jnp.asarray(rng.standard_normal((t, c)), jnp.float32)
        e = float(ess_tail(s))
        assert 0.3 * t * c < e <= 1.6 * t * c

    def test_summary_has_tail(self):
        rng = np.random.default_rng(10)
        s = jnp.asarray(rng.standard_normal((400, 4, 2)), jnp.float32)
        out = jax.jit(mcmc_summary)(s)
        assert out["ess_tail"].shape == (2,)
        assert np.all(np.asarray(out["ess_tail"]) > 50)
