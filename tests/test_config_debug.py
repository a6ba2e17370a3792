"""Config-system and debug-guard tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from cusmc_tpu.config import FilterConfig, run_filter
from cusmc_tpu.io.data import demo_model_params, load_y_sim
from cusmc_tpu.utils.debug import validate_dlm_inputs


class TestFilterConfig:
    def test_roundtrip_and_run(self):
        params = demo_model_params()
        cfg = FilterConfig(num_particles=128, model=params,
                           resampler="systematic", seed=3,
                           return_history=False)
        cfg2 = FilterConfig.from_dict(cfg.to_dict())
        assert cfg2.resampler == "systematic" and cfg2.seed == 3
        ys = load_y_sim()[:31]
        r1 = run_filter(cfg, ys)
        r2 = run_filter(cfg2, ys)
        np.testing.assert_allclose(np.asarray(r1.final_particles),
                                   np.asarray(r2.final_particles),
                                   rtol=1e-6)

    def test_mvt_config(self):
        params = dict(demo_model_params(), df=5.0)
        cfg = FilterConfig(num_particles=64, model=params,
                           distribution="mvt", return_history=False)
        result = run_filter(cfg, load_y_sim()[:21])
        assert np.isfinite(float(result.log_evidence))

    def test_unknown_key_rejected(self):
        with pytest.raises(ValueError, match="unknown config keys"):
            FilterConfig.from_dict({"num_particles": 8, "model": {},
                                    "bogus": 1})


class TestValidation:
    def test_valid_passes(self):
        validate_dlm_inputs(**demo_model_params())

    def test_shape_mismatch(self):
        p = demo_model_params()
        p["G"] = np.eye(3)
        with pytest.raises(ValueError, match="G has shape"):
            validate_dlm_inputs(**p)

    def test_not_pd(self):
        p = demo_model_params()
        p["W"] = -np.eye(2)
        with pytest.raises(ValueError, match="W is not positive"):
            validate_dlm_inputs(**p)

    def test_asymmetric(self):
        p = demo_model_params()
        p["V"] = np.array([[1.0, 0.5], [0.0, 1.0]])
        with pytest.raises(ValueError, match="V is not symmetric"):
            validate_dlm_inputs(**p)

    def test_mvt_df(self):
        p = demo_model_params()
        with pytest.raises(ValueError, match="requires df"):
            validate_dlm_inputs(**p, distribution="mvt")
        with pytest.raises(ValueError, match="df must be positive"):
            validate_dlm_inputs(**p, df=-1.0, distribution="mvt")
