"""Timing harness, sim-trace export, and debug-flag smoke tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from cusmc_tpu.io.data import demo_model_params, load_y_sim, write_sim_output
from cusmc_tpu.models import DLM
from cusmc_tpu.smc.particle_filter import bootstrap_filter
from cusmc_tpu.utils.timing import Timer, scan_slope, sync_time


def test_sync_time_positive():
    f = jax.jit(lambda x: (x * 2.0).sum())
    t = sync_time(f, jnp.ones(1000), reps=2)
    assert t > 0


def test_scan_slope_measures_per_step():
    def mk(carry, T):
        return jax.lax.scan(lambda c, _: (c * 0.999 + 1e-4, ()),
                            carry, jnp.arange(T))[0]

    s = scan_slope(mk, jnp.ones(10_000), steps=(4, 64), reps=2)
    assert np.isfinite(s)


def test_timer():
    t = Timer()
    t.start()
    out = jax.jit(lambda x: x + 1)(jnp.ones(10))
    elapsed = t.stop(out)
    assert elapsed > 0 and t.elapsed == elapsed


def test_write_sim_output(tmp_path):
    T, N, d = 7, 4, 2
    prior_x = np.random.default_rng(0).standard_normal((T, d))
    ys = np.random.default_rng(1).standard_normal((T, d))
    w = np.random.default_rng(2).random((T, N))
    px = np.random.default_rng(3).standard_normal((T, N, d))
    write_sim_output(str(tmp_path), prior_x, ys, w, px, p=1)
    assert os.path.exists(tmp_path / "prior_x_t.csv")
    assert os.path.exists(tmp_path / "y_t.csv")
    assert os.path.exists(tmp_path / "x_t_N1.csv")
    got = np.genfromtxt(tmp_path / "prior_x_t.csv", delimiter=",",
                        skip_header=1)
    np.testing.assert_allclose(got, prior_x, rtol=1e-4, atol=1e-5)


def test_debug_checks_flag_runs(key):
    params = demo_model_params()
    model = DLM.create(noise="mvn", dtype=jnp.float32, **params)
    ys = jnp.asarray(load_y_sim()[:11], jnp.float32)
    result = bootstrap_filter(key, model, ys, 64, debug_checks=True,
                              return_history=False)
    assert np.isfinite(float(result.log_evidence))
