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


@pytest.mark.parametrize("df", [1, 2, 3, 5, 8, 17, 30])
def test_chi2_integer_df_ks(df, key):
    from cusmc_tpu.ops.random import chi2_integer_df

    n = 150_000
    c = np.asarray(chi2_integer_df(key, df, (n,)), np.float64)
    assert (c >= 0).all()
    np.testing.assert_allclose(c.mean(), df, rtol=0.03)
    np.testing.assert_allclose(c.var(), 2 * df, rtol=0.08)
    stat, p = stats.kstest(c, "chi2", args=(df,))
    assert p > 1e-3, f"KS failed for df={df}: stat={stat}, p={p}"


def test_chi2_integer_df_validation(key):
    from cusmc_tpu.ops.random import MAX_INTEGER_DF, chi2_integer_df

    with pytest.raises(ValueError):
        chi2_integer_df(key, 0, (10,))
    with pytest.raises(ValueError):
        chi2_integer_df(key, 5.0, (10,))
    with pytest.raises(ValueError):
        chi2_integer_df(key, MAX_INTEGER_DF + 1, (10,))


def test_dlm_df_int_dispatch(key):
    # Integer df -> static fast path recorded; non-integer/traced -> None.
    from cusmc_tpu.io.data import demo_model_params
    from cusmc_tpu.models.dlm import DLM

    p = demo_model_params(d=2)
    assert DLM.create(noise="mvt", df=5.0, **p).df_int == 5
    assert DLM.create(noise="mvt", df=4.7, **p).df_int is None
    assert DLM.create(noise="mvt", df=64.0, **p).df_int is None

    def make(df):
        return DLM.create(noise="mvt", df=df, **p).df_int is None

    assert jax.jit(make)(jnp.asarray(5.0))  # traced df -> no static path


def test_dlm_packed_mvt_integer_df_moments(key):
    # The packed MVT propagate with the integer-df path: marginal variance
    # of x = mean + L z sqrt(df/chi2) is df/(df-2) * W.
    from cusmc_tpu.io.data import demo_model_params
    from cusmc_tpu.models.dlm import DLM

    df = 5
    p = demo_model_params(d=2)
    model = DLM.create(noise="mvt", df=float(df), **p)
    assert model.df_int == df
    n = 200_000
    X = jnp.zeros((2, n), jnp.float32)
    out = np.asarray(model.propagate_packed(key, X), np.float64)
    W = np.asarray(p["W"], np.float64)
    expect = df / (df - 2.0) * np.diag(W)
    np.testing.assert_allclose(out.var(axis=1), expect, rtol=0.05)
