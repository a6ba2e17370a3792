"""Public API parity tests (reference surface: NAMESPACE:3-8, checklist in
SURVEY.md appendix)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

import cusmc_tpu
from cusmc_tpu.io.data import demo_model_params, load_y_sim


class TestDirectDistributionAPI:
    def test_mvnpdf_sanity_value(self):
        # Executed example from the reference paper (CuSMC/CuSMC.pdf §2.2).
        val = cusmc_tpu.MVNPDF(np.zeros(2), np.zeros(2), np.eye(2))
        assert np.isclose(float(val), 0.1591549, atol=1e-6)

    def test_mvn_draw(self):
        x = cusmc_tpu.MVN(np.zeros(3), np.eye(3), key=1)
        assert x.shape == (3,)
        xs = cusmc_tpu.MVN(np.zeros(3), np.eye(3), key=1, shape=(100,))
        assert xs.shape == (100, 3)

    def test_mvt_draw_and_pdf(self):
        x = cusmc_tpu.MVT(np.zeros(2), np.eye(2), nu=4.0, key=2)
        assert x.shape == (2,)
        v = cusmc_tpu.MVTPDF(np.zeros(2), np.zeros(2), np.eye(2), nu=4.0)
        # MVT(0;0,I2,nu=4) = gamma(3)/gamma(2) / (4*pi) = 2/(4*pi)
        assert np.isclose(float(v), 2.0 / (4.0 * np.pi), rtol=1e-5)

    def test_metropolis_hastings(self):
        w = np.array([0.1, 0.7, 0.1, 0.1])
        a = cusmc_tpu.metropolis_hastings(w, N=4, B=50, key=3)
        assert a.shape == (4,)
        assert (np.asarray(a) >= 0).all() and (np.asarray(a) < 4).all()

    def test_metropolis_hastings_rejects_bad_n(self):
        with pytest.raises(ValueError):
            cusmc_tpu.metropolis_hastings(np.ones(4), N=5)


class TestRun:
    @pytest.fixture(scope="class")
    def run_result(self):
        params = demo_model_params()
        ys = load_y_sim()[:101]
        T, d, N = ys.shape[0], 2, 512
        return cusmc_tpu.run(
            N, d, T, ys.T, params["m0"], params["C0"], params["F"],
            params["G"], params["V"], params["W"], key=0,
            resampler="metropolis", distribution="mvn"), T, N, d

    def test_output_structure(self, run_result):
        out, T, N, d = run_result
        assert out["weights"].shape == (T, N)
        assert out["posterior_x"].shape == (T, N, d)
        assert out["ess"].shape == (T,)
        assert np.isfinite(float(out["log_evidence"]))
        # Row 0: uniform 1/N prior weights (reference mcmc.cpp:85).
        np.testing.assert_allclose(np.asarray(out["weights"][0]), 1.0 / N,
                                   rtol=1e-5)

    def test_accepts_both_y_layouts(self):
        params = demo_model_params()
        ys = load_y_sim()[:41]
        common = dict(m0=params["m0"], C0=params["C0"], F=params["F"],
                      G=params["G"], V=params["V"], W=params["W"], key=0)
        o1 = cusmc_tpu.run(64, 2, 41, ys.T, **common)
        o2 = cusmc_tpu.run(64, 2, 41, ys, **common)
        np.testing.assert_allclose(np.asarray(o1["posterior_x"]),
                                   np.asarray(o2["posterior_x"]))

    def test_mvt_run(self):
        params = demo_model_params()
        ys = load_y_sim()[:41]
        out = cusmc_tpu.run(128, 2, 41, ys, params["m0"], params["C0"],
                            params["F"], params["G"], params["V"], params["W"],
                            df=5.0, distribution="mvt", key=0)
        assert np.isfinite(np.asarray(out["weights"])).all()

    def test_csv_export(self, tmp_path):
        params = demo_model_params()
        ys = load_y_sim()[:21]
        cusmc_tpu.run(32, 2, 21, ys, params["m0"], params["C0"], params["F"],
                      params["G"], params["V"], params["W"], key=0, p=3,
                      output_dir=str(tmp_path))
        # Mirrors writeOutput's file pair (src/io.cpp:7-43).
        assert os.path.exists(tmp_path / "y_t.csv")
        assert os.path.exists(tmp_path / "x_t_N3.csv")
        data = np.genfromtxt(tmp_path / "x_t_N3.csv", delimiter=",",
                             skip_header=1)
        assert data.shape == (21, 3)  # w, x0, x1

    def test_bad_shape_raises(self):
        params = demo_model_params()
        with pytest.raises(ValueError):
            cusmc_tpu.run(8, 2, 10, np.zeros((3, 7)), params["m0"],
                          params["C0"], params["F"], params["G"], params["V"],
                          params["W"])
