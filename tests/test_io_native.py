"""Native host runtime tests: CSV round-trip and trajectory store, with
Python-fallback equivalence (the CPU/GPU dual-path cross-check pattern of
SURVEY.md §4, applied to our native/Python pair)."""

import os

import numpy as np
import pytest

from cusmc_tpu.io.data import load_csv, write_output
from cusmc_tpu.io.native import get_lib, load_csv_native, write_csv_native
from cusmc_tpu.io.native_store import TrajectoryStore

HAVE_NATIVE = get_lib() is not None


def test_csv_roundtrip_python(tmp_path):
    data = np.random.default_rng(0).standard_normal((37, 3))
    path = str(tmp_path / "t.csv")
    header = "a,b,c"
    np.savetxt(path, data, delimiter=",", header=header, comments="",
               fmt="%.10g")
    out = load_csv(path)
    np.testing.assert_allclose(out, data, rtol=1e-9)


@pytest.mark.skipif(not HAVE_NATIVE, reason="native lib not built")
class TestNativeCSV:
    def test_roundtrip(self, tmp_path):
        data = np.random.default_rng(1).standard_normal((53, 4))
        path = str(tmp_path / "n.csv")
        assert write_csv_native(path, "w,x,y,z", data)
        out = load_csv_native(path)
        assert out.shape == (53, 4)
        np.testing.assert_allclose(out, data, rtol=1e-5, atol=1e-8)

    def test_matches_numpy_parser(self, tmp_path):
        data = np.random.default_rng(2).standard_normal((20, 2))
        path = str(tmp_path / "m.csv")
        np.savetxt(path, data, delimiter=",", header="y0,y1", comments="",
                   fmt="%.10g")
        native = load_csv_native(path)
        ref = np.genfromtxt(path, delimiter=",", skip_header=1)
        np.testing.assert_allclose(native, ref, rtol=1e-12)

    def test_no_trailing_newline(self, tmp_path):
        path = str(tmp_path / "t.csv")
        with open(path, "w") as f:
            f.write("a,b\n1.5,2.5\n3.5,4.5")  # no final newline
        out = load_csv_native(path)
        np.testing.assert_allclose(out, [[1.5, 2.5], [3.5, 4.5]])

    def test_missing_file(self):
        with pytest.raises(IOError):
            load_csv_native("/nonexistent/x.csv")


@pytest.mark.parametrize("force_numpy",
                         [True] + ([False] if HAVE_NATIVE else []))
class TestTrajectoryStore:
    def test_append_and_view(self, force_numpy):
        store = TrajectoryStore((4, 2), 10, force_numpy=force_numpy)
        a = np.arange(24, dtype=np.float32).reshape(3, 4, 2)
        b = np.arange(24, 48, dtype=np.float32).reshape(3, 4, 2)
        store.append(a)
        store.append(b)
        assert store.size == 6
        np.testing.assert_array_equal(store.view(),
                                      np.concatenate([a, b]))
        store.close()
        np.testing.assert_array_equal(store.view(),
                                      np.concatenate([a, b]))

    def test_overflow_raises(self, force_numpy):
        store = TrajectoryStore((2,), 3, force_numpy=force_numpy)
        store.append(np.zeros((2, 2), np.float32))
        with pytest.raises(ValueError):
            store.append(np.zeros((2, 2), np.float32))

    def test_shape_mismatch_raises(self, force_numpy):
        store = TrajectoryStore((2, 2), 3, force_numpy=force_numpy)
        with pytest.raises(ValueError):
            store.append(np.zeros((1, 3, 2), np.float32))


def test_write_output_format(tmp_path):
    # Mirrors writeOutput (src/io.cpp:7-43): y_t.csv + x_t_N{p}.csv.
    T, N, d = 5, 4, 2
    ys = np.random.default_rng(3).standard_normal((T, d))
    w = np.random.default_rng(4).random((T, N))
    px = np.random.default_rng(5).standard_normal((T, N, d))
    write_output(str(tmp_path), ys, w, px, p=2)
    y_out = np.genfromtxt(tmp_path / "y_t.csv", delimiter=",", skip_header=1)
    np.testing.assert_allclose(y_out, ys, rtol=1e-4, atol=1e-5)
    x_out = np.genfromtxt(tmp_path / "x_t_N2.csv", delimiter=",",
                          skip_header=1)
    np.testing.assert_allclose(x_out[:, 0], w[:, 0], rtol=1e-4)
    np.testing.assert_allclose(x_out[:, 1:], px[:, 2, :], rtol=1e-4,
                               atol=1e-5)
