"""FFBS smoother tests: agreement with the exact Kalman *smoother* on the
linear-Gaussian model (a stronger oracle than filtering means), plus the
SV path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cusmc_tpu.io.data import demo_model_params
from cusmc_tpu.models import DLM, StochasticVolatility
from cusmc_tpu.smc.ffbs import ffbs, transition_logpdf
from cusmc_tpu.smc.kalman import kalman_filter
from cusmc_tpu.smc.particle_filter import bootstrap_filter


from cusmc_tpu.smc.kalman import rts_smoother as _rts


def rts_smoother(ys, F, G, V, W, m0, C0):
    sm, sc = _rts(ys, F, G, V, W, m0, C0)
    return np.asarray(sm), np.asarray(sc)


@pytest.fixture(scope="module")
def dlm_run():
    params = demo_model_params()
    model = DLM.create(noise="mvn", dtype=jnp.float32, **params)
    xs, ys = model.simulate(jax.random.key(5), 121)
    result = bootstrap_filter(jax.random.key(1), model,
                              jnp.asarray(ys, jnp.float32), 2048,
                              resampler="systematic")
    return params, model, np.asarray(ys), result


def test_transition_logpdf_matches_direct(dlm_run, key):
    params, model, _, _ = dlm_run
    from cusmc_tpu.distributions.mvn import mvn_logpdf_cov

    x_next = jax.random.normal(key, (5, 2), jnp.float32)
    x_prev = jax.random.normal(jax.random.fold_in(key, 1), (7, 2),
                               jnp.float32)
    got = np.asarray(transition_logpdf(model, x_next, x_prev))
    for i in range(5):
        for j in range(7):
            want = float(mvn_logpdf_cov(
                x_next[i], x_prev[j] @ model.G.T,
                jnp.asarray(params["W"], jnp.float32)))
            np.testing.assert_allclose(got[i, j], want, rtol=2e-3,
                                       atol=2e-3)


def test_ffbs_matches_rts_smoother(dlm_run, key):
    params, model, ys, result = dlm_run
    paths = np.asarray(ffbs(key, model, result, num_paths=256))
    sm, sc = rts_smoother(ys, **{k: params[k] for k in
                                 ("F", "G", "V", "W", "m0", "C0")})
    est = paths.mean(axis=1)
    sd = np.sqrt(sc.diagonal(axis1=1, axis2=2))
    err = np.abs(est[5:] - sm[5:])
    # Smoothed means within a few posterior sds everywhere, and typically
    # well inside one sd.
    assert (err < 5.0 * sd[5:]).mean() > 0.99
    assert np.median(err / sd[5:]) < 0.6


def test_ffbs_beats_genealogy_at_early_times(dlm_run, key):
    # FFBS path diversity at t=0 must exceed the collapsed genealogy.
    from cusmc_tpu.smc.smoothing import unique_path_counts

    _, model, _, result = dlm_run
    paths = np.asarray(ffbs(key, model, result, num_paths=256))
    uniq_ffbs_t0 = len(np.unique(paths[0][:, 0].round(6)))
    uniq_gene_t0 = int(np.asarray(unique_path_counts(result))[0])
    # The genealogy at t=0 typically collapses far below N; FFBS keeps
    # per-path independence.
    assert uniq_ffbs_t0 > 10
    assert uniq_ffbs_t0 >= min(uniq_gene_t0, 50)


def test_ffbs_sv_runs(key):
    sv = StochasticVolatility.create()
    xs, ys = sv.simulate(jax.random.key(2), 101)
    result = bootstrap_filter(jax.random.key(3), sv,
                              jnp.asarray(ys, jnp.float32), 1024,
                              resampler="systematic")
    paths = np.asarray(ffbs(key, sv, result, num_paths=64))
    assert paths.shape == (101, 64, 1)
    rmse = np.sqrt(((paths.mean(1)[:, 0] - np.asarray(xs)[:, 0]) ** 2).mean())
    assert rmse < 1.0


def test_ffbs_requires_history(key):
    params = demo_model_params()
    model = DLM.create(noise="mvn", dtype=jnp.float32, **params)
    _, ys = model.simulate(jax.random.key(0), 11)
    result = bootstrap_filter(key, model, jnp.asarray(ys, jnp.float32), 64,
                              return_history=False)
    with pytest.raises(ValueError):
        ffbs(key, model, result)


class TestMVTTransition:
    def test_mvt_matches_scipy_pairwise(self, key):
        # The pairwise [M,N] t-density must equal scipy's multivariate_t
        # evaluated at each (x_next, x_prev) pair.
        from scipy.stats import multivariate_t

        from cusmc_tpu.io.data import demo_model_params
        from cusmc_tpu.models.dlm import DLM
        from cusmc_tpu.smc.ffbs import transition_logpdf

        df = 5.0
        params = demo_model_params(d=2)
        model = DLM.create(noise="mvt", df=df, dtype=jnp.float32, **params)
        rng = np.random.default_rng(0)
        x_next = jnp.asarray(rng.standard_normal((3, 2)), jnp.float32)
        x_prev = jnp.asarray(rng.standard_normal((5, 2)), jnp.float32)
        got = np.asarray(transition_logpdf(model, x_next, x_prev))
        G = np.asarray(params["G"], np.float64)
        W = np.asarray(params["W"], np.float64)
        for i in range(3):
            for j in range(5):
                want = multivariate_t(loc=G @ np.asarray(x_prev)[j],
                                      shape=W, df=df).logpdf(
                                          np.asarray(x_next)[i])
                np.testing.assert_allclose(got[i, j], want, rtol=2e-4,
                                           atol=2e-4)

    def test_large_df_converges_to_gaussian(self, key):
        from cusmc_tpu.io.data import demo_model_params
        from cusmc_tpu.models.dlm import DLM
        from cusmc_tpu.smc.ffbs import transition_logpdf

        params = demo_model_params(d=2)
        mvn = DLM.create(noise="mvn", dtype=jnp.float32, **params)
        mvt = DLM.create(noise="mvt", df=1e4, dtype=jnp.float32, **params)
        # Convergence holds for quadform << df: evaluate at W-scale
        # residuals around the transition mean.
        rng = np.random.default_rng(1)
        b = jnp.asarray(0.1 * rng.standard_normal((6, 2)), jnp.float32)
        G = np.asarray(params["G"], np.float32)
        w_scale = float(np.sqrt(np.diag(params["W"]).mean()))
        a = jnp.asarray(np.asarray(b[:4]) @ G.T
                        + w_scale * rng.standard_normal((4, 2)), jnp.float32)
        got_t = np.asarray(transition_logpdf(mvt, a, b))
        got_g = np.asarray(transition_logpdf(mvn, a, b))
        np.testing.assert_allclose(got_t, got_g, atol=0.05)

    def test_ffbs_runs_on_mvt_model(self, key):
        from cusmc_tpu.io.data import demo_model_params
        from cusmc_tpu.models.dlm import DLM
        from cusmc_tpu.smc.ffbs import ffbs
        from cusmc_tpu.smc.particle_filter import bootstrap_filter

        params = demo_model_params(d=2)
        model = DLM.create(noise="mvt", df=5.0, dtype=jnp.float32, **params)
        _, ys = model.simulate(key, 60)
        res = bootstrap_filter(key, model, jnp.asarray(ys, jnp.float32),
                               1024, resampler="systematic",
                               return_history=True)
        paths = ffbs(jax.random.fold_in(key, 1), model, res, num_paths=32)
        assert paths.shape == (60, 32, 2)
        assert np.isfinite(np.asarray(paths)).all()
        # Smoothed means close to genealogy-traced smoothed means.
        from cusmc_tpu.smc.smoothing import smoothed_means

        gm = np.asarray(smoothed_means(res))
        fm = np.asarray(paths).mean(axis=1)
        # Compare mid-trajectory region where both are well-behaved.
        np.testing.assert_allclose(fm[20:40], gm[20:40], atol=0.6)

    def test_per_dim_chi_rejected(self, key):
        from cusmc_tpu.io.data import demo_model_params
        from cusmc_tpu.models.dlm import DLM
        from cusmc_tpu.smc.ffbs import transition_logpdf

        params = demo_model_params(d=2)
        model = DLM.create(noise="mvt", df=5.0, per_dim_chi=True,
                           dtype=jnp.float32, **params)
        x = jnp.zeros((2, 2), jnp.float32)
        with pytest.raises(NotImplementedError):
            transition_logpdf(model, x, x)
