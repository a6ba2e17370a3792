"""CLI entry point (python -m cusmc_tpu): headless parity with the
reference's script-driven usage (R scripts call CuSMC::run and read the
CSVs io.cpp writes)."""

import json
import os

import numpy as np
import pytest

from cusmc_tpu.__main__ import main
from cusmc_tpu.io.data import demo_model_params, load_y_sim


@pytest.fixture()
def cfg_and_data(tmp_path):
    p = demo_model_params()
    cfg = {
        "num_particles": 512,
        "model": {k: np.asarray(v).tolist() for k, v in p.items()},
        "distribution": "mvn",
        "resampler": "systematic",
        "seed": 1,
    }
    cfgp = tmp_path / "cfg.json"
    cfgp.write_text(json.dumps(cfg))
    datap = tmp_path / "y.csv"
    np.savetxt(datap, load_y_sim()[:40], delimiter=",",
               header="y0,y1", comments="")
    return str(cfgp), str(datap)


def test_cli_run_writes_reference_csvs(tmp_path, capsys, cfg_and_data):
    cfgp, datap = cfg_and_data
    out_dir = str(tmp_path / "out")
    assert main(["run", "--config", cfgp, "--data", datap,
                 "--output-dir", out_dir, "--track", "3"]) == 0
    line = json.loads(capsys.readouterr().out.strip())
    assert np.isfinite(line["log_evidence"])
    assert line["resampler"] == "systematic"
    # The reference CSV pair (io.cpp:7-43): observations + tracked
    # particle trajectory.
    names = sorted(os.listdir(out_dir))
    assert names == ["x_t_N3.csv", "y_t.csv"]
    # Reference column layout (io.cpp:7-43): w, then particle 3's d
    # state columns.
    x = np.loadtxt(os.path.join(out_dir, "x_t_N3.csv"),
                   delimiter=",", skiprows=1)
    assert x.shape == (40, 3)
    assert np.isfinite(x).all()


def test_cli_run_sharded_mesh(capsys, cfg_and_data):
    cfgp, datap = cfg_and_data
    assert main(["run", "--config", cfgp, "--data", datap,
                 "--mesh", "8"]) == 0
    line = json.loads(capsys.readouterr().out.strip())
    assert line["mesh"] == 8
    assert np.isfinite(line["log_evidence"])


def test_cli_demo(capsys):
    assert main(["demo", "--particles", "512", "--steps", "30"]) == 0
    line = json.loads(capsys.readouterr().out.strip())
    assert np.isfinite(line["log_evidence"])
    assert line["particle_steps_per_sec"] > 0


def test_cli_rejects_unknown_config_keys(tmp_path, cfg_and_data):
    cfgp, datap = cfg_and_data
    cfg = json.loads(open(cfgp).read())
    cfg["not_a_key"] = 1
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps(cfg))
    with pytest.raises(ValueError, match="unknown config keys"):
        main(["run", "--config", str(bad), "--data", datap])


def test_cli_stream_checkpoint_resume(tmp_path, capsys, cfg_and_data):
    cfgp, datap = cfg_and_data
    ck = str(tmp_path / "snap")
    assert main(["run", "--config", cfgp, "--data", datap,
                 "--stream", "8", "--checkpoint", ck, "--mesh", "8"]) == 0
    first = json.loads(capsys.readouterr().out.strip())
    assert first["stream"] == 8 and np.isfinite(first["log_evidence"])
    # Resume from the final snapshot ON THE SAME MESH: the clean prefix
    # is reused, so the completed run must agree with the uninterrupted
    # one (the sharded carry folds keys by shard, so resuming on a
    # different mesh shape is legal but not bitwise-comparable).
    assert main(["run", "--config", cfgp, "--data", datap,
                 "--stream", "8", "--checkpoint", ck, "--mesh", "8",
                 "--resume"]) == 0
    second = json.loads(capsys.readouterr().out.strip())
    np.testing.assert_allclose(second["log_evidence"],
                               first["log_evidence"], rtol=1e-4)


def test_cli_stream_rejects_output_dir(tmp_path, cfg_and_data):
    cfgp, datap = cfg_and_data
    assert main(["run", "--config", cfgp, "--data", datap,
                 "--stream", "8",
                 "--output-dir", str(tmp_path / "o")]) == 2
