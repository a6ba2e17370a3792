"""Auxiliary particle filter tests: Kalman-oracle agreement and the
variance advantage over the bootstrap filter under informative
observations (the regime APF exists for)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cusmc_tpu.io.data import demo_model_params
from cusmc_tpu.models import DLM, StochasticVolatility
from cusmc_tpu.smc.apf import auxiliary_filter
from cusmc_tpu.smc.kalman import kalman_filter
from cusmc_tpu.smc.particle_filter import bootstrap_filter


@pytest.fixture(scope="module")
def informative():
    # Informative observations: V < W — bootstrap proposals pay, APF's
    # lookahead helps. (Not extreme: with V/W -> 0 BOTH filters' log Zhat
    # collapses by Jensen bias — transition proposals simply cannot hit a
    # vanishing observation window.)
    params = demo_model_params()
    params["V"] = 0.002 * np.eye(2)
    params["W"] = 0.01 * np.eye(2)
    model = DLM.create(noise="mvn", dtype=jnp.float32, **params)
    _, ys = model.simulate(jax.random.key(9), 101)
    return params, model, np.asarray(ys)


def test_apf_matches_kalman(informative, key):
    params, model, ys = informative
    result = auxiliary_filter(key, model, jnp.asarray(ys, jnp.float32), 4096)
    _, _, kll = kalman_filter(ys, **{k: params[k] for k in
                                     ("F", "G", "V", "W", "m0", "C0")})
    assert abs(float(result.log_evidence) - float(kll)) < \
        0.05 * abs(float(kll))
    assert result.particles.shape == (101, 4096, 2)


def test_apf_lower_variance_than_bootstrap(informative):
    params, model, ys = informative
    _, _, kll = kalman_filter(ys, **{k: params[k] for k in
                                     ("F", "G", "V", "W", "m0", "C0")})
    ysj = jnp.asarray(ys, jnp.float32)
    n = 1024
    apf_z, boot_z = [], []
    for i in range(6):
        k = jax.random.key(100 + i)
        apf_z.append(float(auxiliary_filter(
            k, model, ysj, n, return_history=False).log_evidence))
        boot_z.append(float(bootstrap_filter(
            k, model, ysj, n, resampler="systematic",
            return_history=False).log_evidence))
    # APF's lookahead must not be worse, and usually much tighter.
    apf_err = np.abs(np.asarray(apf_z) - float(kll)).mean()
    boot_err = np.abs(np.asarray(boot_z) - float(kll)).mean()
    assert apf_err <= boot_err * 1.5
    assert np.std(apf_z) <= np.std(boot_z) * 1.5


def test_apf_ess_healthier(informative, key):
    _, model, ys = informative
    apf = auxiliary_filter(key, model, jnp.asarray(ys, jnp.float32), 1024,
                           return_history=False)
    boot = bootstrap_filter(key, model, jnp.asarray(ys, jnp.float32), 1024,
                            resampler="systematic", return_history=False)
    assert float(np.asarray(apf.ess)[1:].mean()) > \
        0.8 * float(np.asarray(boot.ess)[1:].mean())


def test_apf_sv(key):
    sv = StochasticVolatility.create()
    _, ys = sv.simulate(jax.random.key(4), 101)
    result = auxiliary_filter(key, sv, jnp.asarray(ys, jnp.float32), 1024)
    assert np.isfinite(float(result.log_evidence))


def test_apf_requires_propagate_mean(key):
    from cusmc_tpu.models import CustomSSM

    model = CustomSSM.create(
        1, lambda p, k, s: jax.random.normal(k, s + (1,)),
        lambda p, k, x: x, lambda p, y, x: jnp.zeros(x.shape[:-1]))
    with pytest.raises(ValueError, match="propagate_mean"):
        auxiliary_filter(key, model, jnp.zeros((5, 1)), 16)
