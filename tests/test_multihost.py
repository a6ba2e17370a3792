"""Multi-host helper tests (single-process semantics; the DCN path shares
all code with the single-host SPMD programs)."""

import jax
import numpy as np
import pytest

from cusmc_tpu.parallel.multihost import (
    global_mesh,
    initialize_distributed,
    process_info,
)


def test_process_info_single_host():
    info = process_info()
    assert info["process_index"] == 0
    assert info["process_count"] == 1
    assert info["global_devices"] == 8  # conftest virtual mesh


def test_initialize_noop_for_single_process():
    # num_processes<=1 must not touch the distributed runtime.
    initialize_distributed(num_processes=1)


def test_global_mesh_default_and_custom():
    mesh = global_mesh()
    assert mesh.shape["particles"] == 8
    mesh2 = global_mesh({"particles": 4, "chains": 2})
    assert mesh2.shape["particles"] == 4 and mesh2.shape["chains"] == 2
    with pytest.raises(ValueError):
        global_mesh({"particles": 3})


def test_two_process_loopback():
    """Execute the REAL multi-host branch once (SURVEY.md §4): two
    subprocesses, localhost coordinator, 2 virtual CPU devices each ->
    a 4-device global mesh over DCN; each process runs a shard_map psum
    over the process-spanning mesh and the idempotent re-init path.
    Skips loudly if the sandbox forbids local sockets."""
    import os
    import socket
    import subprocess
    import sys

    try:
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
    except OSError as e:  # pragma: no cover
        pytest.skip(f"sandbox forbids local sockets: {e}")

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "_multihost_worker.py")
    coord = f"127.0.0.1:{port}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")

    procs = [subprocess.Popen(
        [sys.executable, worker, coord, "2", str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=root) for pid in range(2)]
    try:
        outs = [p.communicate(timeout=180)[0] for p in procs]
    except subprocess.TimeoutExpired as e:  # pragma: no cover
        for p in procs:
            p.kill()
        pytest.skip(f"distributed loopback timed out in this sandbox: {e}")

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"MULTIHOST_OK {pid} 6.0" in out, out
