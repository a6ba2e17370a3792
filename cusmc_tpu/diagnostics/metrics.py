"""Weight / ancestry diagnostics.

The reference computes none of these (no ESS anywhere — SURVEY.md §6,
absence verified in ``/root/reference/src/mcmc.cpp:239-309``); they are part
of the north-star extension set (BASELINE.json: "ESS collectives"). Each
helper takes an optional ``axis_name`` so the same code runs replicated or
under ``shard_map`` with a psum over the particle mesh axis.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp


def _plogsumexp(logw: jnp.ndarray, axis_name: Optional[str]) -> jnp.ndarray:
    """logsumexp over the local axis, then over the mesh axis if named."""
    if axis_name is None:
        return logsumexp(logw)
    m = jax.lax.pmax(jnp.max(logw), axis_name)
    s = jax.lax.psum(jnp.sum(jnp.exp(logw - m)), axis_name)
    return m + jnp.log(s)


def log_normalize(logw: jnp.ndarray, axis_name: Optional[str] = None):
    """Return (normalized log-weights, log-normalizer)."""
    lse = _plogsumexp(logw, axis_name)
    return logw - lse, lse


def effective_sample_size(logw: jnp.ndarray,
                          axis_name: Optional[str] = None) -> jnp.ndarray:
    """Kish ESS = (sum w)^2 / sum w^2, stable in log space."""
    lse1 = _plogsumexp(logw, axis_name)
    lse2 = _plogsumexp(2.0 * logw, axis_name)
    return jnp.exp(2.0 * lse1 - lse2)


def unique_ancestor_fraction(ancestors: jnp.ndarray) -> jnp.ndarray:
    """Fraction of distinct ancestor indices chosen (degeneracy monitor)."""
    n = ancestors.shape[-1]
    counts = jnp.zeros((n,), jnp.int32).at[ancestors].add(1)
    return jnp.sum(counts > 0) / n


def filter_diagnostics(result) -> dict:
    """Post-hoc observability summary of a FilterResult (SURVEY.md §5
    metrics the reference never computes): per-step ESS, per-step
    unique-ancestor fractions (when history was kept), final-weight ESS,
    and the log-evidence estimate."""
    out = {
        "ess": result.ess,
        "log_evidence": result.log_evidence,
        "final_ess": effective_sample_size(result.final_log_weights),
    }
    if result.ancestors is not None:
        out["unique_ancestor_fraction"] = jax.vmap(
            unique_ancestor_fraction)(result.ancestors)
    return out
