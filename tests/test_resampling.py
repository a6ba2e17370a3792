"""Resampler unit tests: unbiasedness (E[#offspring_i] ∝ w_i — SURVEY.md §4)
and structural properties."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cusmc_tpu.resampling import RESAMPLERS, get_resampler


def offspring_counts(ancestors, n):
    return np.bincount(np.asarray(ancestors), minlength=n)


ALL = sorted(RESAMPLERS)


class TestResamplers:
    @pytest.mark.parametrize("name", ALL)
    def test_shape_dtype_range(self, name, key):
        n = 64
        logw = jax.random.normal(key, (n,))
        a = get_resampler(name)(key, logw)
        assert a.shape == (n,)
        assert a.dtype == jnp.int32
        assert (np.asarray(a) >= 0).all() and (np.asarray(a) < n).all()

    @pytest.mark.parametrize("name", ALL)
    def test_unbiased(self, name, key):
        # Average offspring over many independent resamplings ∝ weights.
        n, reps = 32, 3000
        rng = np.random.default_rng(0)
        w = rng.random(n) + 0.05
        w /= w.sum()
        logw = jnp.log(jnp.asarray(w))
        fn = get_resampler(name)
        keys = jax.random.split(key, reps)
        ancs = jax.vmap(lambda k: fn(k, logw))(keys)
        counts = np.zeros(n)
        for row in np.asarray(ancs):
            counts += np.bincount(row, minlength=n)
        emp = counts / (reps * n)
        # Metropolis with finite B is only approximately unbiased
        # (Murray et al. 2012); give it a looser tolerance.
        atol = 0.02 if name == "metropolis" else 0.004
        np.testing.assert_allclose(emp, w, atol=atol)

    def test_systematic_low_variance(self, key):
        # Systematic resampling: offspring count of particle i is floor or
        # ceil of n*w_i — a single draw suffices to verify.
        n = 128
        rng = np.random.default_rng(1)
        w = rng.random(n) + 0.01
        w /= w.sum()
        a = get_resampler("systematic")(key, jnp.log(jnp.asarray(w)))
        counts = offspring_counts(a, n)
        expect = n * w
        assert (counts >= np.floor(expect) - 1e-9).all()
        assert (counts <= np.ceil(expect) + 1e-9).all()

    def test_residual_deterministic_floor(self, key):
        # Residual resampling copies particle i at least floor(n*w_i) times.
        n = 128
        rng = np.random.default_rng(2)
        w = rng.random(n) + 0.01
        w /= w.sum()
        a = get_resampler("residual")(key, jnp.log(jnp.asarray(w)))
        counts = offspring_counts(a, n)
        assert (counts >= np.floor(n * w) - 1e-9).all()

    def test_residual_exact_multiples_all_deterministic(self, key):
        # Weights that are exact multiples of 1/n leave no residual mass;
        # the outcome is fully deterministic: counts == n*w exactly.
        w = np.array([0.5, 0.25, 0.25, 0.0])  # 4*w = [2, 1, 1, 0]
        logw = jnp.log(jnp.asarray(np.maximum(w, 1e-300)))
        a = get_resampler("residual")(key, logw)
        counts = offspring_counts(a, 4)
        np.testing.assert_array_equal(counts, (4 * w).astype(int))

    def test_metropolis_uniform_weights_keeps_diversity(self, key):
        # With uniform weights every proposal is accepted; ancestors are
        # uniform draws, and the chain must not collapse to one index.
        n = 256
        a = get_resampler("metropolis")(key, jnp.zeros(n))
        assert len(np.unique(np.asarray(a))) > n // 4

    def test_metropolis_b_steps_configurable(self, key):
        logw = jnp.asarray([0.0, 10.0, -10.0, 0.0])
        a1 = get_resampler("metropolis", num_steps=1)(key, logw)
        a50 = get_resampler("metropolis", num_steps=50)(key, logw)
        assert a1.shape == a50.shape == (4,)
        # With a dominant weight and many sweeps, most chains land on index 1.
        assert (np.asarray(a50) == 1).sum() >= 3

    @pytest.mark.parametrize("name", ["systematic", "stratified", "multinomial"])
    def test_degenerate_single_heavy_weight(self, name, key):
        n = 64
        logw = jnp.full((n,), -1e30)
        logw = logw.at[17].set(0.0)
        a = get_resampler(name)(key, logw)
        assert (np.asarray(a) == 17).all()

    def test_metropolis_degenerate_converges_with_steps(self, key):
        # Finite-B Metropolis is only approximately correct (Murray et al.
        # 2012): a chain keeps its start until it PROPOSES the heavy index.
        # With enough sweeps essentially all chains land on it.
        n = 64
        logw = jnp.full((n,), -1e30)
        logw = logw.at[17].set(0.0)
        a = get_resampler("metropolis", num_steps=400)(key, logw)
        assert (np.asarray(a) == 17).mean() > 0.95

    @pytest.mark.parametrize("name", ALL)
    def test_jit_and_reproducible(self, name, key):
        logw = jax.random.normal(key, (64,))
        fn = get_resampler(name)
        a1 = jax.jit(fn)(key, logw)
        a2 = jax.jit(fn)(key, logw)
        a3 = fn(key, logw)
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a3))


class TestPackedResidualOp:
    """The packed-layout residual op (two fused inverse-CDF passes +
    dynamic roll, smc.particle_filter.packed_resample_op) must follow the
    same law as the registry resampler."""

    def _op(self, n):
        from cusmc_tpu.smc.particle_filter import packed_resample_op

        return packed_resample_op("residual", n)

    def test_deterministic_floor_and_gather(self, key):
        n = 128
        rng = np.random.default_rng(3)
        w = rng.random(n) + 0.01
        w /= w.sum()
        logw = jnp.log(jnp.asarray(w, jnp.float32))
        X = jnp.asarray(rng.standard_normal((2, n)), jnp.float32)
        x_anc, logw_out, a = jax.jit(self._op(n))(key, X, logw)
        counts = offspring_counts(a, n)
        assert (counts >= np.floor(n * w) - 1e-9).all()
        assert counts.sum() == n
        np.testing.assert_array_equal(np.asarray(x_anc),
                                      np.asarray(X[:, a]))
        np.testing.assert_allclose(np.asarray(logw_out),
                                   -np.log(n) * np.ones(n), rtol=1e-6)

    def test_exact_multiples_all_deterministic(self, key):
        w = np.array([0.5, 0.25, 0.25, 0.0])
        logw = jnp.asarray(np.log(np.maximum(w, 1e-30)), jnp.float32)
        X = jnp.arange(8, dtype=jnp.float32).reshape(2, 4)
        _, _, a = jax.jit(self._op(4))(key, X, logw)
        counts = offspring_counts(a, 4)
        np.testing.assert_array_equal(counts, (4 * w).astype(int))

    def test_unbiased(self, key):
        n, reps = 32, 2000
        rng = np.random.default_rng(4)
        w = rng.random(n) + 0.05
        w /= w.sum()
        logw = jnp.log(jnp.asarray(w, jnp.float32))
        X = jnp.zeros((2, n), jnp.float32)
        op = jax.jit(self._op(n))
        keys = jax.random.split(key, reps)
        ancs = jax.vmap(lambda k: op(k, X, logw)[2])(keys)
        counts = np.zeros(n)
        for row in np.asarray(ancs):
            counts += np.bincount(row, minlength=n)
        np.testing.assert_allclose(counts / (reps * n), w, atol=0.004)


def test_auto_sweeps_sharp_weights_equals_full_budget(key):
    # ess/N <= 0.5 routes to the full-B branch: outputs must be
    # IDENTICAL to the fixed-B walk (same key stream).
    from cusmc_tpu.resampling.rolls import (
        roll_metropolis_sweeps_expspace,
        roll_metropolis_sweeps_expspace_auto,
    )

    n = 2048
    X = jax.random.normal(key, (2, n), jnp.float32)
    # Sharp: a few heavy particles -> low ESS ratio.
    w = jnp.full((n,), 1e-4).at[:8].set(1.0)
    x_a, a_a = roll_metropolis_sweeps_expspace_auto(key, X, w, 10)
    x_f, a_f = roll_metropolis_sweeps_expspace(key, X, w, 10)
    np.testing.assert_array_equal(np.asarray(a_a), np.asarray(a_f))
    np.testing.assert_array_equal(np.asarray(x_a), np.asarray(x_f))


def test_auto_sweeps_uniformish_offspring_law(key):
    # ess/N > 0.75 routes to the B/4 branch; the offspring law must
    # still track the weights (near-uniform regime mixes in few sweeps).
    from cusmc_tpu.resampling.rolls import (
        roll_metropolis_sweeps_expspace_auto,
    )

    n = 1024
    rng = np.random.default_rng(3)
    w = jnp.asarray(1.0 + 0.3 * rng.random(n), jnp.float32)  # ess/N ~ 0.99
    X = jnp.zeros((1, n), jnp.float32)
    counts = np.zeros(n)
    reps = 200
    fn = jax.jit(lambda k: roll_metropolis_sweeps_expspace_auto(
        k, X, w, 10)[1])
    for i in range(reps):
        counts += np.bincount(np.asarray(fn(jax.random.fold_in(key, i))),
                              minlength=n)
    emp = counts / (reps * n)
    want = np.asarray(w) / float(jnp.sum(w))
    np.testing.assert_allclose(emp, want, atol=6e-4)


def test_auto_sweeps_filter_runs(key):
    # End-to-end plumbing: resampler_kwargs={"num_steps": "auto"}.
    from cusmc_tpu.io.data import demo_model_params
    from cusmc_tpu.models.dlm import DLM
    from cusmc_tpu.smc.particle_filter import bootstrap_filter

    params = demo_model_params()
    model = DLM.create(noise="mvn", dtype=jnp.float32, **params)
    ys = jnp.zeros((8, 2), jnp.float32)
    res = bootstrap_filter(key, model, ys, 1024, resampler="metropolis",
                           resampler_kwargs={"num_steps": "auto"},
                           return_history=False)
    assert np.isfinite(float(res.log_evidence))
