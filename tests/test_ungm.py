"""UNGM — the canonical nonlinear/non-Gaussian benchmark, validated
against an exact dense-grid filter (1-d state makes numerical exactness
affordable: the grid filter IS the true posterior up to discretization).
Also pins the time-varying hook plumbing (the 8cos(1.2t) drift only
works if the scan really passes t to propagate)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cusmc_tpu.models import UNGM
from cusmc_tpu.smc.particle_filter import bootstrap_filter


def grid_filter(model, ys, lo=-30.0, hi=30.0, ng=1201):
    """Exact filter on a dense grid: returns posterior means [T]."""
    xs = np.linspace(lo, hi, ng)
    dx = xs[1] - xs[0]
    q = float(model.q); r = float(model.r)
    p = np.exp(-0.5 * xs * xs / float(model.x0_std) ** 2)
    p /= p.sum()
    means = [float((p * xs).sum())]
    for t in range(1, ys.shape[0]):
        f = 0.5 * xs + 25.0 * xs / (1.0 + xs * xs) + 8.0 * np.cos(1.2 * t)
        trans = np.exp(-0.5 * (xs[:, None] - f[None, :]) ** 2 / q)
        trans /= trans.sum(axis=0, keepdims=True)
        p = trans @ p
        lik = np.exp(-0.5 * (float(ys[t, 0]) - xs * xs / 20.0) ** 2 / r)
        p = p * lik
        p /= p.sum()
        means.append(float((p * xs).sum()))
    return np.asarray(means)


@pytest.fixture(scope="module")
def sim():
    model = UNGM.create(q=10.0, r=1.0)
    xs, ys = model.simulate(jax.random.key(7), 60)
    return model, np.asarray(xs), np.asarray(ys)


def test_tracks_grid_oracle(sim, key):
    model, xs_true, ys = sim
    res = jax.jit(lambda k: bootstrap_filter(
        k, model, jnp.asarray(ys), 8192, resampler="systematic",
        return_history=True))(key)
    hist = np.asarray(res.particles)[..., 0]          # [T, N]
    ll = np.asarray(res.obs_loglik)                   # [T, N]
    w = np.exp(ll - ll.max(axis=1, keepdims=True))
    w /= w.sum(axis=1, keepdims=True)
    pf_means = (w * hist).sum(-1)
    oracle = grid_filter(model, ys)
    err = np.abs(pf_means[1:] - oracle[1:])
    # UNGM posteriors are multimodal; means still must agree with the
    # exact filter (both average over the same modes)
    assert np.median(err) < 0.5
    assert err.mean() < 1.5


def test_time_dependence_actually_used(sim, key):
    # a model whose propagate ignores t produces a DIFFERENT filter:
    # verifies the scan really forwards t (8cos(1.2t) is large)
    model, _, ys = sim
    res_t = bootstrap_filter(key, model, jnp.asarray(ys), 512,
                             resampler="systematic",
                             return_history=False)

    class Frozen(UNGM):
        def propagate_packed(self, key, X, t=None):
            return UNGM.propagate_packed(self, key, X, 0.0)

    frozen = Frozen(q=model.q, r=model.r, x0_std=model.x0_std)
    res_0 = bootstrap_filter(key, frozen, jnp.asarray(ys), 512,
                             resampler="systematic",
                             return_history=False)
    assert abs(float(res_t.log_evidence)
               - float(res_0.log_evidence)) > 1.0


def test_simulate_shapes(sim):
    model, xs, ys = sim
    assert xs.shape == (60,)
    assert ys.shape == (60, 1)
    assert np.isfinite(xs).all() and np.isfinite(ys).all()
