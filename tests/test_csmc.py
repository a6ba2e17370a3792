"""Conditional SMC / particle Gibbs tests: clamping invariants and
agreement of the PG smoothing posterior with the exact RTS oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cusmc_tpu.io.data import demo_model_params
from cusmc_tpu.models import DLM
from cusmc_tpu.smc.csmc import conditional_smc, particle_gibbs
from cusmc_tpu.smc.kalman import rts_smoother


@pytest.fixture(scope="module")
def setup():
    params = demo_model_params()
    model = DLM.create(noise="mvn", dtype=jnp.float32, **params)
    xs, ys = model.simulate(jax.random.key(13), 61)
    return params, model, np.asarray(xs), jnp.asarray(ys, jnp.float32)


def test_reference_path_is_clamped(setup, key):
    _, model, xs, ys = setup
    ref = jnp.asarray(xs, jnp.float32) * 0.5  # arbitrary reference
    r = conditional_smc(key, model, ys, ref, 256)
    # Slot 0 must hold the reference path exactly at every step...
    np.testing.assert_allclose(np.asarray(r.particles[:, 0, :]),
                               np.asarray(ref), rtol=1e-6)
    # ...and its ancestry must be self-referential.
    assert (np.asarray(r.ancestors)[:, 0] == 0).all()


def test_particle_gibbs_matches_rts(setup, key):
    params, model, xs, ys = setup
    paths = particle_gibbs(key, model, ys, num_particles=512, num_iters=120)
    paths = np.asarray(paths)[40:]  # burn-in
    est = paths.mean(axis=0)
    sm, sc = rts_smoother(np.asarray(ys),
                          **{k: params[k] for k in
                             ("F", "G", "V", "W", "m0", "C0")})
    sm, sc = np.asarray(sm), np.asarray(sc)
    sd = np.sqrt(sc.diagonal(axis1=1, axis2=2))
    err = np.abs(est[5:] - sm[5:])
    assert (err < 5.0 * sd[5:]).mean() > 0.99
    assert np.median(err / sd[5:]) < 0.7


def test_paths_mix(setup, key):
    # Consecutive PG paths must differ (chain actually moves).
    _, model, _, ys = setup
    paths = np.asarray(particle_gibbs(key, model, ys, 256, 10))
    diffs = np.abs(np.diff(paths, axis=0)).max(axis=(1, 2))
    assert (diffs > 0).all()


def test_jittable(setup, key):
    _, model, _, ys = setup
    f = jax.jit(lambda k: particle_gibbs(k, model, ys, 128, 5))
    paths = f(key)
    assert paths.shape == (5, ys.shape[0], 2)
