"""Tests for the structural time-series builders (models/structural.py):
block composition, the seasonal sum-to-zero rotation, and a Kalman-oracle
filter run on a level+trend+seasonal superposition."""

import jax
import jax.numpy as jnp
import numpy as np

from cusmc_tpu.models.structural import (
    combine,
    local_level,
    local_linear_trend,
    seasonal,
)
from cusmc_tpu.smc.kalman import kalman_filter
from cusmc_tpu.smc.particle_filter import bootstrap_filter


def test_combine_blocks_and_shapes():
    model = combine([local_linear_trend(), seasonal(4)], obs_var=0.2)
    d = 2 + 3
    assert model.G.shape == (d, d)
    assert model.F.shape == (1, d)
    G = np.asarray(model.G, np.float64)
    # Block diagonality: off-diagonal blocks are zero.
    assert np.all(G[:2, 2:] == 0) and np.all(G[2:, :2] == 0)
    # Trend block.
    np.testing.assert_array_equal(G[:2, :2], [[1, 1], [0, 1]])
    # Observation reads level + current seasonal effect.
    np.testing.assert_array_equal(np.asarray(model.F)[0], [1, 0, 1, 0, 0])
    assert abs(float(model.V_chol[0, 0] ** 2) - 0.2) < 1e-6


def test_seasonal_rotation_sums_to_zero():
    # Deterministic seasonal dynamics: over one full period the observed
    # seasonal effects sum to zero, and the pattern repeats with period s.
    s = 5
    comp = seasonal(s, seasonal_var=0.0)
    G = comp.G
    x = np.asarray([1.7, -0.3, 0.9, -2.3])  # any sum-to-... any start
    effects = []
    for _ in range(3 * s):
        effects.append(x[0])
        x = G @ x
    effects = np.asarray(effects)
    # After the first period the rotation enforces sum-to-zero per cycle.
    for start in range(s, 2 * s):
        assert abs(effects[start:start + s].sum()) < 1e-9
    # Periodicity.
    np.testing.assert_allclose(effects[s:2 * s], effects[2 * s:3 * s],
                               atol=1e-9)


def test_structural_filter_matches_kalman(key):
    # Level+trend+seasonal superposition, simulate + filter, compare the
    # particle posterior to the exact Kalman posterior. State noises are
    # kept non-degenerate: the bootstrap PF's logZ estimate develops a
    # genuine (Jensen) downward bias when transition noise is ~zero in
    # some state dims (particle impoverishment), which is a property of
    # the algorithm, not of this implementation.
    model = combine([local_linear_trend(level_var=0.02, slope_var=2e-3),
                     seasonal(4, seasonal_var=5e-3)], obs_var=0.25)
    T = 120
    _, ys = model.simulate(key, T)
    ys = jnp.asarray(ys, jnp.float32)

    res = bootstrap_filter(jax.random.fold_in(key, 1), model, ys, 8192,
                           resampler="systematic", return_history=False)

    F = np.asarray(model.F, np.float64)
    G = np.asarray(model.G, np.float64)
    V = np.asarray(model.V_chol, np.float64) @ np.asarray(
        model.V_chol, np.float64).T
    W = np.asarray(model.W_sqrt, np.float64) @ np.asarray(
        model.W_sqrt, np.float64).T
    m0 = np.asarray(model.m0, np.float64)
    C0 = np.asarray(model.C0_sqrt, np.float64) @ np.asarray(
        model.C0_sqrt, np.float64).T
    km, kc, kll = kalman_filter(np.asarray(ys, np.float64), F=F, G=G, V=V,
                                W=W, m0=m0, C0=C0)

    w = np.exp(np.asarray(res.final_log_weights, np.float64))
    w /= w.sum()
    fmean = (w[:, None] * np.asarray(res.final_particles, np.float64)).sum(0)
    sd = np.sqrt(np.asarray(kc)[-1].diagonal())
    assert np.all(np.abs(fmean - np.asarray(km)[-1]) < 6 * sd + 1e-3)
    # Evidence within 1% of the exact marginal likelihood.
    assert abs(float(res.log_evidence) - float(kll)) < 0.01 * abs(float(kll))


def test_combine_validations():
    import pytest

    with pytest.raises(ValueError):
        combine([])
    with pytest.raises(ValueError):
        seasonal(1)


def test_structural_mvt_noise_runs(key):
    model = combine([local_level()], obs_var=0.1, noise="mvt", df=5.0)
    _, ys = model.simulate(key, 30)
    res = bootstrap_filter(key, model, jnp.asarray(ys, jnp.float32), 1024,
                           return_history=False)
    assert bool(jnp.isfinite(res.log_evidence))
