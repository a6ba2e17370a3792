"""Out-of-core trajectory store tests: native async writer round-trip,
Python fallback equivalence, and streaming-filter integration."""

import numpy as np
import pytest

from cusmc_tpu.io.disk_store import DiskTrajectoryStore


def fill_and_check(store, tmp_path_str):
    rng = np.random.default_rng(0)
    blocks = [rng.standard_normal((k, 4, 3)).astype(np.float32)
              for k in (1, 5, 2)]
    for b in blocks:
        store.append(b)
    store.finish()
    got = store.view()
    expect = np.concatenate(blocks)
    np.testing.assert_array_equal(np.asarray(got), expect)
    # Reopen from the sidecar alone.
    reopened = DiskTrajectoryStore.open(tmp_path_str)
    np.testing.assert_array_equal(np.asarray(reopened), expect)


class TestDiskStore:
    def test_native_roundtrip(self, tmp_path):
        p = str(tmp_path / "hist.bin")
        store = DiskTrajectoryStore(p, (4, 3))
        if not store.native:
            pytest.skip("native lib not built")
        fill_and_check(store, p)

    def test_python_fallback_roundtrip(self, tmp_path):
        p = str(tmp_path / "hist_py.bin")
        store = DiskTrajectoryStore(p, (4, 3), force_python=True)
        assert not store.native
        fill_and_check(store, p)

    def test_native_and_fallback_identical(self, tmp_path):
        rng = np.random.default_rng(1)
        block = rng.standard_normal((7, 2, 2)).astype(np.float32)
        pa, pb = str(tmp_path / "a.bin"), str(tmp_path / "b.bin")
        sa = DiskTrajectoryStore(pa, (2, 2))
        sb = DiskTrajectoryStore(pb, (2, 2), force_python=True)
        for s in (sa, sb):
            s.append(block)
            s.finish()
        np.testing.assert_array_equal(np.asarray(sa.view()),
                                      np.asarray(sb.view()))

    def test_shape_validation_and_finish_guard(self, tmp_path):
        store = DiskTrajectoryStore(str(tmp_path / "v.bin"), (3,))
        with pytest.raises(ValueError):
            store.append(np.zeros((2, 4), np.float32))
        store.append(np.zeros((2, 3), np.float32))
        store.finish()
        with pytest.raises(RuntimeError):
            store.append(np.zeros((1, 3), np.float32))

    def test_many_chunks_async(self, tmp_path):
        # More chunks than queue depth: exercises the blocking submit path.
        p = str(tmp_path / "many.bin")
        store = DiskTrajectoryStore(p, (64,), queue_depth=2)
        rng = np.random.default_rng(2)
        blocks = [rng.standard_normal((8, 64)).astype(np.float32)
                  for _ in range(32)]
        for b in blocks:
            store.append(b)
        store.finish()
        np.testing.assert_array_equal(np.asarray(store.view()),
                                      np.concatenate(blocks))


class TestStreamingSpill:
    def test_streaming_filter_spills_to_disk(self, tmp_path, key):
        import jax.numpy as jnp

        from cusmc_tpu.io.data import demo_model_params
        from cusmc_tpu.models.dlm import DLM
        from cusmc_tpu.smc.streaming import streaming_bootstrap_filter

        params = demo_model_params(d=2)
        model = DLM.create(noise="mvn", dtype=jnp.float32, **params)
        rng = np.random.default_rng(3)
        ys = rng.standard_normal((33, 2)).astype(np.float32)
        ys[0] = 0
        p = str(tmp_path / "spill.bin")
        res, store = streaming_bootstrap_filter(
            key, model, ys, num_particles=256, chunk_steps=8,
            spill_path=p)
        hist = store.view()
        assert hist.shape == (33, 256, 2)
        assert np.isfinite(np.asarray(hist)).all()
        assert np.isfinite(float(res.log_evidence))
        # In-RAM store run must produce the identical history.
        res2, store2 = streaming_bootstrap_filter(
            key, model, ys, num_particles=256, chunk_steps=8)
        np.testing.assert_array_equal(np.asarray(hist),
                                      np.asarray(store2.view()))
