"""Tests for the model protocol (SV + custom models), particle smoothing,
and PMMH parameter inference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cusmc_tpu.models import CustomSSM, DLM, StochasticVolatility
from cusmc_tpu.io.data import demo_model_params
from cusmc_tpu.mcmc.pmmh import pmmh
from cusmc_tpu.smc.particle_filter import bootstrap_filter
from cusmc_tpu.smc.smoothing import (
    ancestral_paths,
    smoothed_means,
    unique_path_counts,
)


class TestStochVol:
    @pytest.fixture(scope="class")
    def sv(self):
        model = StochasticVolatility.create(mu=-1.0, phi=0.9, sigma=0.4,
                                            beta=0.8)
        xs, ys = model.simulate(jax.random.key(7), 301)
        return model, np.asarray(xs), np.asarray(ys)

    @pytest.mark.parametrize("layout", ["packed", "batch"])
    def test_filter_tracks_volatility(self, sv, layout, key):
        model, xs, ys = sv
        result = bootstrap_filter(key, model, jnp.asarray(ys, jnp.float32),
                                  4096, resampler="systematic",
                                  layout=layout)
        w = np.exp(np.asarray(result.obs_loglik)
                   - np.asarray(result.obs_loglik).max(1, keepdims=True))
        w /= w.sum(1, keepdims=True)
        pm = (w[:, :, None] * np.asarray(result.particles)).sum(1)[:, 0]
        # Filtered log-vol correlates strongly with the truth.
        corr = np.corrcoef(pm[10:], xs[10:, 0])[0, 1]
        assert corr > 0.6, corr
        assert np.isfinite(float(result.log_evidence))

    def test_ess_adaptive(self, sv, key):
        model, _, ys = sv
        result = bootstrap_filter(key, model, jnp.asarray(ys, jnp.float32),
                                  1024, resampler="systematic",
                                  ess_threshold=0.5)
        assert np.isfinite(np.asarray(result.ess)).all()


class TestCustomSSM:
    def test_random_walk_model(self, key):
        # Simple nonlinear model via plain functions.
        def init(params, k, shape):
            return params["scale"] * jax.random.normal(k, shape + (1,))

        def prop(params, k, x):
            return jnp.tanh(x) + 0.1 * jax.random.normal(k, x.shape)

        def obs(params, y, x):
            r = y[0] - x[..., 0]
            return -0.5 * r * r / 0.01

        model = CustomSSM.create(1, init, prop, obs,
                                 params={"scale": jnp.float32(1.0)})
        ys = jnp.zeros((21, 1), jnp.float32)
        result = bootstrap_filter(key, model, ys, 256,
                                  resampler="systematic")
        assert result.particles.shape == (21, 256, 1)

    def test_packed_layout_rejected(self, key):
        model = CustomSSM.create(
            1, lambda p, k, s: jax.random.normal(k, s + (1,)),
            lambda p, k, x: x, lambda p, y, x: jnp.zeros(x.shape[:-1]))
        with pytest.raises(ValueError, match="packed"):
            bootstrap_filter(key, model, jnp.zeros((5, 1)), 64,
                             layout="packed")


class TestSmoothing:
    @pytest.fixture(scope="class")
    def run(self):
        params = demo_model_params()
        model = DLM.create(noise="mvn", dtype=jnp.float32, **params)
        xs, ys = model.simulate(jax.random.key(3), 101)
        result = bootstrap_filter(jax.random.key(1), model,
                                  jnp.asarray(ys, jnp.float32), 512,
                                  resampler="systematic")
        return result, np.asarray(xs)

    def test_paths_consistent_with_history(self, run):
        result, _ = run
        paths = np.asarray(ancestral_paths(result))
        T, N, d = np.asarray(result.particles).shape
        assert paths.shape == (T, N, d)
        # Final slice of paths == final particle cloud.
        np.testing.assert_array_equal(paths[-1],
                                      np.asarray(result.particles)[-1])
        # Every path state must exist in that step's cloud.
        t = T // 2
        cloud = np.asarray(result.particles)[t]
        assert np.isin(paths[t][:, 0].round(5), cloud[:, 0].round(5)).all()

    def test_smoothed_means_track_truth(self, run):
        result, xs = run
        sm = np.asarray(smoothed_means(result))
        rmse = np.sqrt(((sm[10:] - xs[10:]) ** 2).mean())
        assert rmse < 0.15, rmse

    def test_degeneracy_monotone(self, run):
        result, _ = run
        uniq = np.asarray(unique_path_counts(result))
        assert uniq[-1] == 512
        # Lineage diversity can only shrink backward in time.
        assert (np.diff(uniq) >= 0).all()


class TestPMMH:
    def test_recovers_observation_scale(self, key):
        # Infer log observation-noise scale of a 1-d DLM.
        true_v = 0.04
        I1 = np.eye(1)
        model_true = DLM.create(F=I1, G=0.9 * I1, m0=np.zeros(1), C0=I1,
                                V=true_v * I1, W=0.01 * I1,
                                dtype=jnp.float32)
        _, ys = model_true.simulate(jax.random.key(11), 101)

        def builder(theta):
            return DLM.create(F=I1, G=0.9 * I1, m0=np.zeros(1), C0=I1,
                              V=jnp.exp(theta[0]) * jnp.eye(1),
                              W=0.01 * I1, dtype=jnp.float32)

        log_prior = lambda th: -0.5 * jnp.sum(th ** 2) / 9.0
        result = jax.jit(lambda k: pmmh(
            k, builder, log_prior, jnp.asarray([0.0], jnp.float32),
            jnp.asarray(ys, jnp.float32), 256, 150, step_size=0.4))(key)

        assert 0.02 < float(result.accept_rate) < 0.9
        post = np.exp(np.asarray(result.thetas)[75:, 0])
        assert 0.3 * true_v < np.median(post) < 3.0 * true_v, np.median(post)
