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
