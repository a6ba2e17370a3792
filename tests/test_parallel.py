"""Sharded == single-device tests on the virtual 8-device CPU mesh
(SURVEY.md §4 "Distributed"): the sharded filter and MH sampler must agree
with their single-device counterparts statistically, and collectives must
produce identical replicated diagnostics on every shard."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cusmc_tpu.io.data import demo_model_params, load_y_sim
from cusmc_tpu.distributions import mvn_logpdf_cov
from cusmc_tpu.models.dlm import DLM
from cusmc_tpu.parallel import (
    make_mesh,
    sharded_bootstrap_filter,
    sharded_mh_sampler,
)
from cusmc_tpu.smc.kalman import kalman_filter
from cusmc_tpu.smc.particle_filter import bootstrap_filter


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    return make_mesh({"particles": 8})


@pytest.fixture(scope="module")
def demo():
    params = demo_model_params()
    ys = jnp.asarray(load_y_sim()[:201], jnp.float32)
    model = DLM.create(noise="mvn", dtype=jnp.float32, **params)
    return params, model, ys


@pytest.mark.parametrize("resampler", ["systematic", "metropolis",
                                       "stratified", "multinomial"])
def test_sharded_filter_matches_kalman(demo, mesh, resampler, key):
    params, model, ys = demo
    n = 4096
    result = sharded_bootstrap_filter(key, model, ys, n, mesh,
                                      resampler=resampler)
    km, kc, kll = kalman_filter(np.asarray(ys),
                                **{k: params[k] for k in
                                   ("F", "G", "V", "W", "m0", "C0")})
    # Weighted mean of the final cloud vs final Kalman mean.
    w = np.exp(np.asarray(result.final_log_weights))
    w /= w.sum()
    fmean = (w[:, None] * np.asarray(result.final_particles)).sum(0)
    sd = np.sqrt(np.asarray(kc)[-1].diagonal())
    assert np.all(np.abs(fmean - np.asarray(km)[-1]) < 6.0 * sd)
    # Log evidence close to the exact marginal likelihood.
    assert abs(float(result.log_evidence) - float(kll)) < 0.05 * abs(float(kll))
    assert np.isfinite(np.asarray(result.ess)).all()


def test_sharded_history_and_global_ancestors(demo, mesh, key):
    _, model, ys = demo
    n = 1024
    result = sharded_bootstrap_filter(key, model, ys[:51], n, mesh,
                                      resampler="systematic",
                                      return_history=True)
    assert result.particles.shape == (51, n, 2)
    assert result.ancestors.shape == (51, n)
    a = np.asarray(result.ancestors)
    assert (a >= 0).all() and (a < n).all()
    # Global ancestor indices must span shard boundaries eventually.
    assert (a[1:] // (n // 8) != np.arange(n)[None, :] // (n // 8)).any()


def test_sharded_vs_single_device_log_evidence(demo, mesh, key):
    _, model, ys = demo
    n = 2048
    sharded = sharded_bootstrap_filter(key, model, ys, n, mesh,
                                       resampler="systematic")
    single = bootstrap_filter(key, model, ys, n, resampler="systematic",
                              return_history=False)
    # Different RNG layouts -> statistically equal, not bitwise.
    assert abs(float(sharded.log_evidence) - float(single.log_evidence)) < \
        0.02 * abs(float(single.log_evidence))


def test_sharded_skip_branch_global_ancestry(demo, mesh, key):
    # Regression: when ESS-adaptive resampling SKIPS, the identity ancestry
    # must be recorded in GLOBAL indices (matching the sharded resample
    # ops), not shard-local ones.
    params, _, ys = demo
    # Flat likelihood (huge V) -> ESS stays ~N -> resampling never fires.
    flat = dict(params, V=100.0 * np.eye(2))
    model = DLM.create(noise="mvn", dtype=jnp.float32, **flat)
    n = 1024
    res = sharded_bootstrap_filter(key, model, ys[:21], n, mesh,
                                   resampler="systematic",
                                   ess_threshold=0.5,
                                   return_history=True)
    a = np.asarray(res.ancestors)
    np.testing.assert_array_equal(
        a[1:], np.broadcast_to(np.arange(n), (20, n)))


def test_sharded_adaptive_resampling(demo, mesh, key):
    _, model, ys = demo
    result = sharded_bootstrap_filter(key, model, ys[:101], 1024, mesh,
                                      resampler="systematic",
                                      ess_threshold=0.5)
    assert np.isfinite(float(result.log_evidence))
    assert np.isfinite(np.asarray(result.ess)).all()


def test_sharded_mh_matches_target(key):
    mesh = make_mesh({"chains": 8})
    d, chains, steps = 4, 128, 2000
    cov = jnp.eye(d, dtype=jnp.float32)
    log_prob = lambda x: mvn_logpdf_cov(x, jnp.zeros(d, jnp.float32), cov)
    init = jax.random.normal(key, (chains, d), jnp.float32)
    result = sharded_mh_sampler(key, log_prob, init, steps, mesh,
                                keep_samples=True, step_size=0.8)
    assert result.samples.shape == (steps, chains, d)
    samples = np.asarray(result.samples[steps // 2:]).reshape(-1, d)
    np.testing.assert_allclose(samples.mean(0), np.zeros(d), atol=0.15)
    np.testing.assert_allclose(samples.var(0), np.ones(d), rtol=0.25)
    assert 0.05 < float(result.accept_rate) < 0.9


def test_sharded_mh_pooled_adaptation(key):
    mesh = make_mesh({"chains": 8})
    d, chains = 8, 64
    log_prob = lambda x: mvn_logpdf_cov(x, jnp.zeros(d, jnp.float32),
                                        jnp.eye(d, dtype=jnp.float32))
    init = jnp.zeros((chains, d), jnp.float32)
    result = sharded_mh_sampler(key, log_prob, init, 1500, mesh,
                                step_size=1e-3, adapt_rate=0.1)
    # Pooled adaptation must drive acceptance toward target from a bad start.
    assert 0.1 < float(result.accept_rate) < 0.6
    # step_size replicated across shards -> a scalar here.
    assert result.step_size.shape == ()


def test_indivisible_particles_raises(demo, mesh, key):
    _, model, ys = demo
    with pytest.raises(ValueError):
        sharded_bootstrap_filter(key, model, ys[:11], 1001, mesh)


def test_sharded_pt_bimodal(key):
    from cusmc_tpu.parallel import sharded_pt_sampler
    mesh = make_mesh({"chains": 8})
    d, chains, steps = 2, 64, 2500
    sep = 4.0

    def mix(x):
        a = -0.5 * jnp.sum((x + sep) ** 2, axis=-1)
        b = -0.5 * jnp.sum((x - sep) ** 2, axis=-1)
        return jnp.logaddexp(a, b)

    # all chains start in the left mode; only tempering can rebalance
    init = -sep + 0.5 * jax.random.normal(key, (chains, d), jnp.float32)
    res = sharded_pt_sampler(key, mix, init, steps, mesh,
                             keep_samples=True, num_rungs=6,
                             beta_min=0.02, step_size=0.6)
    assert res.samples.shape == (steps, chains, d)
    frac_right = float((np.asarray(res.samples[steps // 2:, :, 0]) > 0)
                       .mean())
    assert 0.25 < frac_right < 0.75
    # per-rung scales replicated across shards; swap stats pooled
    assert res.step_size.shape == (6,)
    assert res.swap_rate.shape == (5,)
    assert np.isfinite(np.asarray(res.swap_rate)).all()


def test_sharded_pt_indivisible_raises(key):
    from cusmc_tpu.parallel import sharded_pt_sampler
    mesh = make_mesh({"chains": 8})
    logp = lambda x: -0.5 * jnp.sum(x * x, axis=-1)
    init = jnp.zeros((12, 2), jnp.float32)
    with pytest.raises(ValueError, match="divisible"):
        sharded_pt_sampler(key, logp, init, 10, mesh)


def test_sharded_chees_pooled_adaptation(key):
    from cusmc_tpu.parallel import sharded_chees_sampler
    mesh = make_mesh({"chains": 8})
    d, chains, steps = 4, 64, 600
    stds = jnp.asarray([1.0, 2.0, 4.0, 8.0], jnp.float32)
    logp = lambda x: -0.5 * jnp.sum((x / stds) ** 2, axis=-1)
    init = stds * jax.random.normal(key, (chains, d), jnp.float32)
    res = sharded_chees_sampler(key, logp, init, steps, mesh,
                                keep_samples=True, step_size=0.3,
                                init_traj=0.6)
    assert res.samples.shape == (steps, chains, d)
    # pooled adaptation -> replicated scalars
    assert res.traj_length.shape == ()
    assert res.mass_var.shape == (4,)
    ratio = np.asarray(res.mass_var) / np.asarray(stds) ** 2
    assert (ratio > 0.3).all() and (ratio < 3.0).all()
    s = np.asarray(res.samples[steps // 2:]).reshape(-1, d)
    np.testing.assert_allclose(s.var(0), np.asarray(stds) ** 2, rtol=0.4)


def test_p1_mesh_specializes_to_unsharded(key):
    # 1-shard meshes skip shard_map entirely; results must equal the
    # unsharded sampler with the shard-0 key fold, bitwise.
    from cusmc_tpu.mcmc import metropolis_hastings_sampler
    from cusmc_tpu.parallel import sharded_mh_sampler
    mesh = make_mesh({"chains": 1}, devices=jax.devices()[:1])
    logp = lambda x: -0.5 * jnp.sum(x * x, axis=-1)
    init = jax.random.normal(key, (16, 3), jnp.float32)
    a = sharded_mh_sampler(key, logp, init, 50, mesh, keep_samples=True)
    b = metropolis_hastings_sampler(jax.random.fold_in(key, 0), logp,
                                    init, 50, keep_samples=True)
    np.testing.assert_array_equal(np.asarray(a.samples),
                                  np.asarray(b.samples))


def test_sharded_stretch_independent_ensembles(key):
    from cusmc_tpu.parallel import sharded_stretch_sampler
    mesh = make_mesh({"chains": 8})
    d, walkers, steps = 2, 128, 1500  # 16 walkers/shard >= 2d+2
    logp = lambda x: -0.5 * jnp.sum(x * x, axis=-1)
    init = jax.random.normal(key, (walkers, d), jnp.float32)
    res = sharded_stretch_sampler(key, logp, init, steps, mesh,
                                  keep_samples=True)
    assert res.samples.shape == (steps, walkers, d)
    s = np.asarray(res.samples[steps // 2:]).reshape(-1, d)
    np.testing.assert_allclose(s.var(0), 1.0, rtol=0.3)
    assert 0.1 < float(res.accept_rate) < 0.9
