"""2-D mesh tests: replicate (DP) axis composed with the particle
(collective) axis."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cusmc_tpu.io.data import demo_model_params, load_y_sim
from cusmc_tpu.models import DLM
from cusmc_tpu.parallel import make_mesh
from cusmc_tpu.parallel.replicated import replicated_sharded_filters
from cusmc_tpu.smc.kalman import kalman_filter


@pytest.fixture(scope="module")
def setup():
    params = demo_model_params()
    model = DLM.create(noise="mvn", dtype=jnp.float32, **params)
    ys = jnp.asarray(load_y_sim()[:101], jnp.float32)
    mesh = make_mesh({"chains": 2, "particles": 4})
    return params, model, ys, mesh


def test_replicates_agree_with_oracle(setup, key):
    params, model, ys, mesh = setup
    res = replicated_sharded_filters(key, model, ys, 2048, 4, mesh,
                                     resampler="metropolis")
    _, _, kll = kalman_filter(np.asarray(ys),
                              **{k: params[k] for k in
                                 ("F", "G", "V", "W", "m0", "C0")})
    lzs = np.asarray(res.log_evidence)
    assert lzs.shape == (4,)
    # Every replicate within the metropolis finite-B band of the oracle.
    assert (np.abs(lzs - float(kll)) < 0.08 * abs(float(kll))).all()
    # Replicates are independent: not all identical.
    assert np.unique(lzs).size == 4
    assert res.final_particles.shape == (4, 2048, 2)
    assert res.ess.shape == (4, 101)


def test_systematic_variant(setup, key):
    _, model, ys, mesh = setup
    res = replicated_sharded_filters(key, model, ys, 1024, 2, mesh,
                                     resampler="systematic")
    assert np.isfinite(np.asarray(res.log_evidence)).all()


def test_divisibility_errors(setup, key):
    _, model, ys, mesh = setup
    with pytest.raises(ValueError, match="replicates"):
        replicated_sharded_filters(key, model, ys, 1024, 3, mesh)
    with pytest.raises(ValueError, match="particles"):
        replicated_sharded_filters(key, model, ys, 1023, 2, mesh)
