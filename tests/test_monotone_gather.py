"""Tests for the monotone-ancestor apply kernels (ops/monotone_gather).

The kernels contain NO PRNG — unlike the fused filter step, interpret
mode here is a full correctness test of the kernel logic (window DMAs,
in-kernel binary search, dynamic_gather apply), not just structure.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cusmc_tpu.ops.monotone_gather import (
    _merge_rank_ancestors,
    inverse_cdf_apply,
    take_columns,
)
from cusmc_tpu.resampling.classic import (
    POSITION_FNS,
    systematic_ancestors,
)

N, TILE, D = 2048, 512, 3


def _rand_sorted_ancestors(key, n):
    return jnp.sort(jax.random.randint(key, (n,), 0, n, jnp.int32))


def test_take_columns_cpu_fallback(key):
    # On CPU (no interpret) the op is plain jnp.take.
    X = jax.random.normal(key, (D, 300), jnp.float32)
    a = _rand_sorted_ancestors(key, 300)
    np.testing.assert_array_equal(take_columns(X, a), jnp.take(X, a, axis=1))


def test_take_columns_kernel_matches_take(key):
    X = jax.random.normal(key, (D, N), jnp.float32)
    a = _rand_sorted_ancestors(key, N)
    out = take_columns(X, a, tile=TILE, interpret=True)
    np.testing.assert_array_equal(out, jnp.take(X, a, axis=1))


def test_take_columns_huge_spans(key):
    # Sorted ancestors whose per-block span covers most of the array
    # (constant runs then a jump — what concentrated weights produce).
    # The merge-path walk must resolve these in-kernel; the old fixed
    # window fell back to the random gather here.
    X = jax.random.normal(key, (D, N), jnp.float32)
    a = jnp.sort(jnp.where(jnp.arange(N) % 7 == 0, N - 1,
                           jnp.arange(N) % 3)).astype(jnp.int32)
    out = take_columns(X, a, tile=TILE, interpret=True)
    np.testing.assert_array_equal(out, jnp.take(X, a, axis=1))


def test_take_columns_unsorted_falls_back(key):
    X = jax.random.normal(key, (D, N), jnp.float32)
    a = jax.random.randint(key, (N,), 0, N, jnp.int32)  # unsorted
    out = take_columns(X, a, tile=TILE, interpret=True)
    np.testing.assert_array_equal(out, jnp.take(X, a, axis=1))


@pytest.mark.parametrize("name", sorted(POSITION_FNS))
def test_inverse_cdf_apply_matches_merge_rank(key, name):
    kw, kp = jax.random.split(key)
    logw = jax.random.normal(kw, (N,), jnp.float32)
    cdf = jnp.cumsum(jax.nn.softmax(logw))
    positions = POSITION_FNS[name](kp, N, jnp.float32)
    X = jax.random.normal(kp, (D, N), jnp.float32)

    y, a = inverse_cdf_apply(cdf, positions, X, tile=TILE, interpret=True)
    a_ref = _merge_rank_ancestors(cdf, positions)
    np.testing.assert_array_equal(a, a_ref)
    np.testing.assert_array_equal(y, jnp.take(X, a_ref, axis=1))


def test_inverse_cdf_apply_concentrated_weights(key):
    # One particle carries ~all the mass at index 0: ranks jump from 0 to
    # ~N inside one block. The merge-path kernel walks extra windows for
    # that block (no fallback) and must still match merge-rank exactly
    # (the small-N cumsum here is monotone, so there are no f32 wiggle
    # ties to diverge on).
    logw = jnp.full((N,), -20.0).at[0].set(0.0)
    cdf = jnp.cumsum(jax.nn.softmax(logw))
    positions = POSITION_FNS["systematic"](key, N, jnp.float32)
    X = jax.random.normal(key, (D, N), jnp.float32)

    y, a = inverse_cdf_apply(cdf, positions, X, tile=TILE, interpret=True)
    a_ref = _merge_rank_ancestors(cdf, positions)
    np.testing.assert_array_equal(a, a_ref)
    np.testing.assert_array_equal(y, jnp.take(X, a_ref, axis=1))


def test_inverse_cdf_apply_long_zero_runs(key):
    # Floor-count cdf (the residual resampler's deterministic pass):
    # most entries are zero-weight, so cdf plateaus span many window
    # rows — the case that overflowed the old fixed-window kernel at
    # realistic N (796 rows vs 16, benchmarks/probe_residual.py). Every
    # block walks as many windows as its span needs.
    kw, kp, kx = jax.random.split(key, 3)
    w = jnp.floor(N * jax.nn.softmax(
        3.0 * jax.random.normal(kw, (N,), jnp.float32)))
    cdf = jnp.cumsum(w)
    positions = POSITION_FNS["systematic"](kp, N, jnp.float32) * cdf[-1]
    X = jax.random.normal(kx, (D, N), jnp.float32)

    y, a = inverse_cdf_apply(cdf, positions, X, tile=TILE, interpret=True)
    a_ref = _merge_rank_ancestors(cdf, positions)
    np.testing.assert_array_equal(a, a_ref)
    np.testing.assert_array_equal(y, jnp.take(X, a_ref, axis=1))


def test_inverse_cdf_apply_matches_registry_systematic(key):
    # End-to-end semantic parity with the registry resampler.
    logw = jax.random.normal(key, (N,), jnp.float32)
    cdf = jnp.cumsum(jax.nn.softmax(logw))
    from cusmc_tpu.resampling.classic import systematic_positions

    positions = systematic_positions(key, N, jnp.float32)
    X = jax.random.normal(key, (D, N), jnp.float32)
    _, a = inverse_cdf_apply(cdf, positions, X, tile=TILE, interpret=True)
    a_reg = systematic_ancestors(key, logw)
    np.testing.assert_array_equal(a, a_reg)


def test_packed_filter_systematic_uses_new_op(key):
    # The packed-layout filter with a CDF resampler must still match the
    # Kalman oracle statistically — covered by test_particle_filter; here
    # just smoke the wiring end to end on CPU.
    from cusmc_tpu.io.data import demo_model_params
    from cusmc_tpu.models.dlm import DLM
    from cusmc_tpu.smc.particle_filter import bootstrap_filter

    model = DLM.create(noise="mvn", **demo_model_params(d=2))
    _, ys = model.simulate(key, 30)
    res = bootstrap_filter(key, model, jnp.asarray(ys, jnp.float32), 1024,
                           resampler="systematic", layout="packed")
    assert bool(jnp.isfinite(res.log_evidence))
    assert res.particles.shape == (30, 1024, 2)
    # ancestors from the fused op must be valid indices
    assert int(res.ancestors.min()) >= 0
    assert int(res.ancestors.max()) < 1024


def test_inverse_cdf_apply_local_base(key):
    # Round 4: local_base mode — search the GLOBAL cdf while applying
    # against a LOCAL block (the sharded ring exchange's fused round).
    # Ancestors must be identical to global mode; values must equal the
    # gather wherever the ancestor falls inside the local block.
    n_glob = 8192
    n_loc = 2048
    kw, kp, kx = jax.random.split(key, 3)
    w = jax.random.uniform(kw, (n_glob,), jnp.float32, minval=0.01)
    cdf = jnp.cumsum(w)
    X_glob = jax.random.normal(kx, (D, n_glob), jnp.float32)
    for shard in range(4):
        base = shard * n_loc
        u = jax.random.uniform(jax.random.fold_in(kp, shard), ())
        slots = jnp.arange(base, base + n_loc, dtype=jnp.float32)
        pos = (slots + u) / n_glob * cdf[-1]
        X_loc = X_glob[:, base:base + n_loc]
        y, a = inverse_cdf_apply(cdf, pos, X_loc, tile=512,
                                 interpret=True, local_base=base)
        a_ref = _merge_rank_ancestors(cdf, pos)
        # Exact-rank equality is brittle at cdf knot ties (f32 cumsum
        # is not bitwise monotone): allow off-by-one, and assert the
        # value gather is SELF-consistent with the returned ancestors.
        assert (np.abs(np.asarray(a) - np.asarray(a_ref)) <= 1).all()
        a_np = np.asarray(a)
        hit = (a_np >= base) & (a_np < base + n_loc)
        assert hit.any()
        np.testing.assert_array_equal(
            np.asarray(y)[:, hit],
            np.asarray(X_glob)[:, a_np[hit]])


def test_inverse_cdf_apply_local_base_concentrated(key):
    # All mass on one particle OUTSIDE most shards' blocks: ancestors
    # still exact; no value hits for shards not owning it.
    n_glob = 8192
    n_loc = 2048
    kx = jax.random.fold_in(key, 9)
    w = jnp.full((n_glob,), 1e-12, jnp.float32).at[100].set(1.0)
    cdf = jnp.cumsum(w)
    X_glob = jax.random.normal(kx, (D, n_glob), jnp.float32)
    for shard in (0, 3):
        base = shard * n_loc
        slots = jnp.arange(base, base + n_loc, dtype=jnp.float32)
        pos = (slots + 0.5) / n_glob * cdf[-1]
        X_loc = X_glob[:, base:base + n_loc]
        y, a = inverse_cdf_apply(cdf, pos, X_loc, tile=512,
                                 interpret=True, local_base=base)
        a_np = np.asarray(a)
        assert (a_np == 100).all()
        if shard == 0:
            np.testing.assert_array_equal(
                np.asarray(y), np.asarray(X_glob)[:, a_np])


def test_inverse_cdf_apply_fastb_matches_default(key):
    # The two-table phase-B variant (kept for the record after its
    # measured composed-filter loss, RESULTS.md) must stay EXACT:
    # identical ancestors/values to the production chain, including the
    # >2-row-span fallback (concentrated comb forces it).
    from cusmc_tpu.ops.monotone_gather import inverse_cdf_apply

    n = 8192
    kx, kw = jax.random.split(key)
    X = jax.random.normal(kx, (D, n), jnp.float32)
    for tag, w in (
        ("healthy", jnp.exp(0.5 * jax.random.normal(kw, (n,),
                                                    jnp.float32))),
        ("comb", jnp.full((n,), 1e-12,
                          jnp.float32).at[::512].set(1.0)),
    ):
        cdf = jnp.cumsum(w)
        pos = (jnp.arange(n, dtype=jnp.float32) + 0.25) / n * cdf[-1]
        y0, a0 = inverse_cdf_apply(cdf, pos, X, tile=512,
                                   interpret=True)
        y1, a1 = inverse_cdf_apply(cdf, pos, X, tile=512,
                                   interpret=True, _ablate="fastb")
        np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1),
                                      err_msg=tag)
        np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1),
                                      err_msg=tag)
