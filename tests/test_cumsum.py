"""Tests for the single-pass blocked prefix-sum kernel (ops/cumsum).

No PRNG in the kernel, so interpret mode is a full correctness test of
the blocked Hillis-Steele prefix + sequential carry logic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cusmc_tpu.ops.cumsum import BROWS_CANDIDATES, FOLD, blocked_cumsum


# One size per block-row candidate (each exercises a different
# in-block prefix depth), plus a multi-block case at the smallest.
@pytest.mark.parametrize("n", sorted(
    {FOLD * r for r in BROWS_CANDIDATES}
    | {3 * FOLD * max(BROWS_CANDIDATES)}))
def test_blocked_cumsum_matches_jnp(key, n):
    w = jax.random.uniform(key, (n,), jnp.float32)
    cdf, cdf128 = blocked_cumsum(w, interpret=True)
    ref = jnp.cumsum(w)
    np.testing.assert_allclose(np.asarray(cdf), np.asarray(ref),
                               rtol=2e-6, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(cdf128),
                                  np.asarray(cdf)[FOLD - 1::FOLD])
    # monotone by construction (weights are non-negative)
    assert bool(jnp.all(jnp.diff(cdf) >= 0))


def test_blocked_cumsum_fallback_shapes():
    # Ineligible length -> jnp.cumsum fallback; strided slice only when
    # divisible by FOLD.
    w = jnp.ones((FOLD * 3,), jnp.float32)  # 3 rows: no candidate divides
    cdf, cdf128 = blocked_cumsum(w)
    np.testing.assert_allclose(np.asarray(cdf), np.arange(1, FOLD * 3 + 1),
                               rtol=1e-6)
    assert cdf128.shape == (3,)
    cdf, cdf128 = blocked_cumsum(jnp.ones((7,), jnp.float32))
    assert cdf128 is None
