"""Checkpoint/resume tests: a crashed-and-resumed run must continue the
exact carry trajectory of an uninterrupted run (SURVEY.md §5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cusmc_tpu.checkpoint import FilterCheckpoint
from cusmc_tpu.io.data import demo_model_params, load_y_sim
from cusmc_tpu.models.dlm import DLM
from cusmc_tpu.smc.streaming import streaming_bootstrap_filter


@pytest.fixture(scope="module")
def setup():
    params = demo_model_params()
    model = DLM.create(noise="mvn", dtype=jnp.float32, **params)
    ys = load_y_sim()[:81]
    return model, ys


@pytest.mark.parametrize("use_orbax", [False, True])
def test_save_restore_roundtrip(tmp_path, key, use_orbax):
    ck = FilterCheckpoint(str(tmp_path / "ck"), use_orbax=use_orbax)
    x = np.random.default_rng(0).standard_normal((64, 2)).astype(np.float32)
    logw = np.random.default_rng(1).standard_normal(64).astype(np.float32)
    ck.save(17, x, logw, key, -123.5)
    snap = ck.restore()
    assert snap["t"] == 17
    np.testing.assert_array_equal(np.asarray(snap["particles"]), x)
    np.testing.assert_array_equal(np.asarray(snap["log_weights"]), logw)
    assert snap["log_evidence"] == -123.5
    # Restored key generates the same stream.
    a = jax.random.normal(snap["key"], (4,))
    b = jax.random.normal(key, (4,))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_latest_picks_highest_step(tmp_path, key):
    ck = FilterCheckpoint(str(tmp_path / "ck"), use_orbax=False)
    x = np.zeros((4, 2), np.float32)
    w = np.zeros(4, np.float32)
    ck.save(10, x, w, key, 0.0)
    ck.save(40, x, w, key, 0.0)
    ck.save(25, x, w, key, 0.0)
    assert "step_40" in ck.latest()


def test_resume_continues_exact_trajectory(tmp_path, setup, key):
    model, ys = setup
    n = 256

    # Uninterrupted run.
    full, _ = streaming_bootstrap_filter(key, model, ys, n, chunk_steps=20,
                                         resampler="systematic")

    # Run with checkpoints (same chunking -> same everything).
    ck = FilterCheckpoint(str(tmp_path / "ck"), use_orbax=False)
    streaming_bootstrap_filter(key, model, ys, n, chunk_steps=20,
                               resampler="systematic", checkpoint=ck,
                               checkpoint_every=20)
    # "Crash": resume from the latest snapshot and finish.
    resumed, _ = streaming_bootstrap_filter(
        key, model, ys, n, chunk_steps=20, resampler="systematic",
        checkpoint=ck, resume=True, store_particles=False)

    np.testing.assert_allclose(np.asarray(resumed.final_particles),
                               np.asarray(full.final_particles),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(float(resumed.log_evidence),
                               float(full.log_evidence), rtol=1e-5)


def test_restore_empty_raises(tmp_path):
    ck = FilterCheckpoint(str(tmp_path / "nothing"), use_orbax=False)
    with pytest.raises(FileNotFoundError):
        ck.restore()
