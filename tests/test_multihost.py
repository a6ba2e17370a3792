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
