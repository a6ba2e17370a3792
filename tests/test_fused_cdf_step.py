"""Fused inverse-CDF step tests (interpret mode on CPU).

Unlike the windowed-Metropolis kernel, the resample stage here is fully
deterministic given the positions: for systematic mode the shared offset
``u`` is drawn OUTSIDE the kernel from the jax key, so the ancestor
vector is exactly checkable against the XLA merge-rank law even though
interpret-mode ``pltpu.prng_random_bits`` returns constant bits (which
only degrades the process-noise draws). Statistical checks (noise
moments, Kalman tracking, XLA-vs-kernel logZ parity) run on the real
chip via ``benchmarks/validate_fused_tpu.py``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cusmc_tpu.ops.cumsum import blocked_cumsum
from cusmc_tpu.ops.fused_cdf_step import fused_cdf_filter_step

D, N, TILE = 2, 4096, 1024


def reference_systematic_ancestors(key, w, n):
    """The ancestor law the kernel must reproduce: rank of positions
    (i + u) * total / n in the inclusive cumsum (side='right'), with u
    drawn exactly as fused_cdf_filter_step derives it from ``key``."""
    k_u, _ = jax.random.split(key)
    u = jax.random.uniform(k_u, (), jnp.float32)
    cdf = jnp.cumsum(w)
    pscale = cdf[-1] / n
    pos = (jnp.arange(n, dtype=jnp.float32) + u) * pscale
    a = jnp.searchsorted(cdf, pos, side="right")
    return np.clip(np.asarray(a), 0, n - 1), np.asarray(cdf), np.asarray(pos)


def run_step(key, w, X, mode="systematic", noise="mvn", df=None,
             df_int=None, Q_scale=0.0, tile=TILE, sr=8):
    cdf, cdf128 = blocked_cumsum(w)
    if cdf128 is None:
        cdf128 = cdf[127::128]
    G = jnp.eye(D)
    Q = jnp.eye(D) * Q_scale
    F = jnp.eye(D)
    Li = jnp.eye(D)
    y = jnp.zeros((D,), jnp.float32)
    return fused_cdf_filter_step(
        key, cdf, cdf128, X, y, G, Q, F, Li, df, jnp.float32(0.0),
        noise=noise, mode=mode, tile=tile, sr=sr, interpret=True,
        df_int=df_int)


@pytest.fixture
def wx(key):
    w = jax.random.uniform(jax.random.fold_in(key, 7), (N,), jnp.float32,
                           minval=0.01)
    X = jax.random.normal(key, (D, N), jnp.float32)
    return w, X


def assert_sandwich(a, cdf, pos):
    """Inverse-CDF correctness without exact-rank brittleness: f32
    parallel cumsums are not bitwise monotone, so assert the sandwich
    cdf[a-1] <= p <= cdf[min(a+1, n-1)] instead of a == searchsorted."""
    n = cdf.shape[0]
    lo = np.where(a > 0, cdf[np.maximum(a - 1, 0)], -np.inf)
    hi = cdf[np.minimum(a + 1, n - 1)]
    ok = (lo <= pos + 1e-6 * np.abs(pos)) & (pos <= hi + 1e-6 * np.abs(hi))
    assert ok.all(), f"sandwich violated at {np.where(~ok)[0][:10]}"


def test_systematic_ancestors_match_law(key, wx):
    w, X = wx
    x_new, ll, a = run_step(key, w, X)
    a_ref, cdf, pos = reference_systematic_ancestors(key, w, N)
    a = np.asarray(a)
    assert_sandwich(a, cdf, pos)
    # Against the independent searchsorted oracle, ranks agree up to
    # the f32 cumsum rounding wiggle (off-by-one at knot ties).
    assert (np.abs(a - a_ref) <= 1).all()
    assert np.isfinite(np.asarray(ll)).all()


def test_zero_noise_state_is_gather(key, wx):
    # Q=0, G=I: x_new must be exactly X[:, a].
    w, X = wx
    x_new, _, a = run_step(key, w, X)
    np.testing.assert_array_equal(np.asarray(x_new),
                                  np.asarray(X)[:, np.asarray(a)])


def test_concentrated_weights_span(key, wx):
    # One particle holds ~all the mass: every output block's ancestors
    # collapse to one index far from the block — the dynamic window
    # walk must still resolve (no fixed-span assumption).
    _, X = wx
    w = jnp.full((N,), 1e-12, jnp.float32).at[N // 3].set(1.0)
    x_new, _, a = run_step(key, w, X)
    a = np.asarray(a)
    assert (a == N // 3).mean() > 0.999
    np.testing.assert_array_equal(np.asarray(x_new),
                                  np.asarray(X)[:, a])


def test_stratified_ancestors_sorted_and_valid(key, wx):
    w, X = wx
    # Interpret-mode PRNG returns constant bits, so the stratified
    # in-kernel uniforms are a constant u — positions remain sorted and
    # the law degenerates to systematic-with-that-u: still a valid
    # structural check of the mode plumbing.
    x_new, ll, a = run_step(key, w, X, mode="stratified")
    a = np.asarray(a)
    assert (np.diff(a) >= 0).all()
    assert (a >= 0).all() and (a < N).all()
    np.testing.assert_array_equal(np.asarray(x_new),
                                  np.asarray(X)[:, a])


def test_multiblock_tiles(key, wx):
    # Several query groups per block (tile=2048 -> 16 query rows).
    w, X = wx
    x_new, _, a = run_step(key, w, X, tile=2048)
    a_ref, cdf, pos = reference_systematic_ancestors(key, w, N)
    assert_sandwich(np.asarray(a), cdf, pos)
    np.testing.assert_array_equal(np.asarray(x_new),
                                  np.asarray(X)[:, np.asarray(a)])


def test_sr16_window(key, wx):
    w, X = wx
    x_new, _, a = run_step(key, w, X, sr=16)
    a_ref, cdf, pos = reference_systematic_ancestors(key, w, N)
    assert_sandwich(np.asarray(a), cdf, pos)


def test_rejects_bad_modes_and_dtypes(key, wx):
    w, X = wx
    with pytest.raises(ValueError, match="mode"):
        run_step(key, w, X, mode="multinomial")
    with pytest.raises(ValueError, match="float32"):
        cdf, cdf128 = blocked_cumsum(w)
        fused_cdf_filter_step(
            key, cdf, cdf128, X.astype(jnp.bfloat16),
            jnp.zeros((D,)), jnp.eye(D), jnp.eye(D), jnp.eye(D),
            jnp.eye(D), None, 0.0, tile=TILE, interpret=True)
    with pytest.raises(ValueError, match="df_int"):
        run_step(key, w, X, noise="mvt", df=64.0, df_int=64)


def test_filter_engine_pallas_systematic(key):
    # End-to-end: bootstrap_filter routes engine='pallas' + systematic
    # to the fused kernel; ancestors in the result must obey the
    # inverse-CDF law per step (checked structurally: sorted + valid).
    from cusmc_tpu.io.data import demo_model_params
    from cusmc_tpu.models.dlm import DLM
    from cusmc_tpu.smc.particle_filter import bootstrap_filter

    params = demo_model_params()
    model = DLM.create(noise="mvn", dtype=jnp.float32, **params)
    ys = jnp.zeros((5, 2), jnp.float32)
    res = bootstrap_filter(key, model, ys, 4096, resampler="systematic",
                           engine="pallas", pallas_interpret=True,
                           return_history=True)
    a = np.asarray(res.ancestors)
    assert (np.diff(a, axis=1) >= 0).all()
    assert np.isfinite(float(res.log_evidence))


def test_fused_cdf_eligibility_predicate(key):
    # The eligibility predicate gates engine='pallas' CDF mode (auto
    # never selects this kernel — measured slower than the XLA pipeline
    # at every d, RESULTS.md round-4 negative result).
    from cusmc_tpu.io.data import demo_model_params
    from cusmc_tpu.models.dlm import DLM
    from cusmc_tpu.smc.particle_filter import _fused_cdf_eligible

    params = demo_model_params()
    model = DLM.create(noise="mvn", dtype=jnp.float32, **params)
    assert _fused_cdf_eligible(model, 4096)
    model_bf16 = DLM.create(noise="mvn", dtype=jnp.float32,
                            state_dtype=jnp.bfloat16, **params)
    assert not _fused_cdf_eligible(model_bf16, 4096)
    assert not _fused_cdf_eligible(model, 1000)  # indivisible N


def test_group_bounds_cover_kernel_positions():
    # Round-5 advisor fix: the host-side group-bound table must bracket
    # every in-kernel position fl((g + u) * pscale) with count-<= rank
    # semantics, for ANY u in [0, 1) — guaranteed because the bounds use
    # the same single-rounding product at u=0 and f32 multiplication is
    # monotone. Checked here in pure f32 numpy over adversarial totals.
    rng = np.random.default_rng(7)
    n = 1 << 14
    gq = 1024
    for total in (1e-6, 1.0, 3.7e5, 1e9):
        pscale = np.float32(total) / np.float32(n)
        g = np.arange(n, dtype=np.float32)
        bounds = (np.arange(n // gq + 1, dtype=np.float32) * gq) * pscale
        for u in (0.0, 1e-7, 0.3, 0.9999999):
            p = (g + np.float32(u)).astype(np.float32) * pscale
            p = p.astype(np.float32)
            gi = (np.arange(n) // gq)
            assert (p >= bounds[gi]).all(), (total, u)
            assert (p <= bounds[gi + 1]).all(), (total, u)
