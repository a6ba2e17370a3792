"""Statistical validation of the fixed-round Marsaglia-Tsang gamma sampler
against scipy's exact distribution (moments + KS test)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from cusmc_tpu.ops.random import fast_chi2, fast_gamma


@pytest.mark.parametrize("alpha", [0.5, 1.0, 2.5, 8.0, 64.0])
def test_gamma_moments(alpha, key):
    n = 400_000
    g = np.asarray(fast_gamma(key, alpha, (n,)))
    assert (g > 0).all()
    np.testing.assert_allclose(g.mean(), alpha, rtol=0.02)
    np.testing.assert_allclose(g.var(), alpha, rtol=0.05)


@pytest.mark.parametrize("alpha", [0.7, 2.5, 16.0])
def test_gamma_ks(alpha, key):
    n = 100_000
    g = np.asarray(fast_gamma(key, alpha, (n,)), np.float64)
    # KS against the exact CDF: p-value must not indicate gross mismatch.
    stat, p = stats.kstest(g, "gamma", args=(alpha,))
    assert p > 1e-3, f"KS failed: stat={stat}, p={p}"


def test_chi2(key):
    df = 5.0
    n = 200_000
    c = np.asarray(fast_chi2(key, df, (n,)))
    np.testing.assert_allclose(c.mean(), df, rtol=0.02)
    np.testing.assert_allclose(c.var(), 2 * df, rtol=0.06)


def test_reproducible(key):
    a = fast_gamma(key, 2.0, (100,))
    b = jax.jit(lambda k: fast_gamma(k, 2.0, (100,)))(key)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_matches_jax_gamma_distributionally(key):
    # Same distribution as jax.random.gamma (different stream).
    n, alpha = 100_000, 3.0
    ours = np.asarray(fast_gamma(key, alpha, (n,)), np.float64)
    ref = np.asarray(jax.random.gamma(jax.random.fold_in(key, 9), alpha,
                                      (n,)), np.float64)
    stat, p = stats.ks_2samp(ours, ref)
    assert p > 1e-3
