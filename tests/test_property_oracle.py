"""Randomized-model oracle tests: for arbitrary (well-conditioned) DLMs the
filter must agree with the exact Kalman solution — a fuzz net over the
whole pipeline (factorizations, packed ops, resampling, normalization)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cusmc_tpu.models import DLM
from cusmc_tpu.smc.kalman import kalman_filter
from cusmc_tpu.smc.particle_filter import bootstrap_filter


def random_dlm(rng, d, k):
    a = rng.standard_normal((d, d)) / np.sqrt(d)
    G = 0.9 * a / max(1.0, np.abs(np.linalg.eigvals(a)).max())  # stable
    F = rng.standard_normal((k, d))

    def spd(n, scale):
        b = rng.standard_normal((n, n))
        return scale * (b @ b.T / n + np.eye(n))

    return dict(F=F, G=G, m0=rng.standard_normal(d),
                C0=spd(d, 1.0), V=spd(k, 0.05), W=spd(d, 0.1))


@pytest.mark.parametrize("seed,d,k", [(0, 1, 1), (1, 2, 2), (2, 3, 1),
                                      (3, 4, 2), (4, 2, 3)])
def test_random_dlm_matches_kalman(seed, d, k, key):
    rng = np.random.default_rng(seed)
    params = random_dlm(rng, d, k)
    model = DLM.create(noise="mvn", dtype=jnp.float32, **params)
    _, ys = model.simulate(jax.random.fold_in(key, seed), 81)
    result = bootstrap_filter(jax.random.fold_in(key, 100 + seed), model,
                              jnp.asarray(ys, jnp.float32), 4096,
                              resampler="systematic", return_history=False)
    _, _, kll = kalman_filter(np.asarray(ys), **params)
    assert np.isfinite(float(result.log_evidence))
    # Systematic resampling at N=4096 over 80 steps: a few percent of |logZ|
    # covers MC error across arbitrary well-conditioned models.
    tol = max(0.05 * abs(float(kll)), 6.0)
    assert abs(float(result.log_evidence) - float(kll)) < tol, \
        (float(result.log_evidence), float(kll))


@pytest.mark.parametrize("seed", [0, 1])
def test_random_dlm_eigh_sqrt(seed, key):
    # The eigendecomposition square root (reference parity path) must give
    # the same posterior quality as Cholesky.
    rng = np.random.default_rng(10 + seed)
    params = random_dlm(rng, 2, 2)
    m_eigh = DLM.create(noise="mvn", sqrt_method="eigh", dtype=jnp.float32,
                        **params)
    _, ys = m_eigh.simulate(jax.random.fold_in(key, seed), 61)
    res = bootstrap_filter(jax.random.fold_in(key, 50 + seed), m_eigh,
                           jnp.asarray(ys, jnp.float32), 4096,
                           resampler="systematic", return_history=False)
    _, _, kll = kalman_filter(np.asarray(ys), **params)
    tol = max(0.05 * abs(float(kll)), 6.0)
    assert abs(float(res.log_evidence) - float(kll)) < tol
