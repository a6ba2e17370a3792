"""Debug / validation modes.

The reference's failure handling is abort-on-CUDA-error macros
(``/root/reference/inst/include/support.cuh:9-32``) and it *contains* data
races (shared RNG + loop variables across OpenMP threads,
``src/samplers.cpp:11,17-18``; SURVEY.md §5). In JAX those races are
designed out by purity; what remains is numeric failure. This module
provides:

- ``debug_mode()``: context manager enabling jax_debug_nans +
  disable_jit for pinpointing the op that produced a NaN;
- ``assert_finite_weights``: checkify-able guard for log-weights inside
  jitted code (NaN/-inf collapse detection with step context);
- ``validate_dlm_inputs``: host-side shape/PD validation with messages
  naming the offending argument (the reference silently mis-runs on, e.g.,
  the df/runtime argument swap — SURVEY.md §7 defect ledger).
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
import numpy as np


class FilterDivergedError(RuntimeError):
    """Raised by snapshot-and-halt guards (SURVEY.md §5 failure
    detection): the filter state degenerated (NaN weights / collapsed
    cloud). Carries the last step with verified-finite state and, when a
    checkpoint was wired, the path of the auto-saved snapshot to resume
    from."""

    def __init__(self, message: str, last_good_step: int,
                 snapshot: str = None):
        super().__init__(message)
        self.last_good_step = last_good_step
        self.snapshot = snapshot


@contextlib.contextmanager
def debug_mode(disable_jit: bool = False):
    """Enable NaN debugging (and optionally eager mode) within a scope."""
    with contextlib.ExitStack() as stack:
        stack.enter_context(jax.debug_nans(True))
        if disable_jit:
            stack.enter_context(jax.disable_jit())
        yield


def assert_finite_weights(logw: jnp.ndarray, t=None) -> None:
    """Inside jit: print a diagnostic when the weight vector degenerates
    (all -inf => the filter lost track; NaN => numeric fault upstream)."""
    bad_nan = jnp.any(jnp.isnan(logw))
    all_ninf = jnp.all(jnp.isneginf(logw))

    def report(args):
        bad_nan, all_ninf, t = args
        jax.debug.print(
            "cusmc_tpu weight guard: nan={n} collapsed={c} at t={t}",
            n=bad_nan, c=all_ninf, t=t)

    jax.lax.cond(bad_nan | all_ninf, report, lambda a: None,
                 (bad_nan, all_ninf, -1 if t is None else t))


def validate_dlm_inputs(F, G, m0, C0, V, W, df=None, distribution="mvn"):
    """Host-side validation; raises ValueError naming the bad argument."""
    F, G, m0, C0, V, W = map(np.asarray, (F, G, m0, C0, V, W))
    d = m0.shape[0]
    k = F.shape[0]
    checks = [
        ("G", G, (d, d)), ("C0", C0, (d, d)), ("W", W, (d, d)),
        ("F", F, (k, d)), ("V", V, (k, k)),
    ]
    for name, arr, shape in checks:
        if arr.shape != shape:
            raise ValueError(f"{name} has shape {arr.shape}, expected {shape}")
    for name, arr in (("C0", C0), ("W", W), ("V", V)):
        if not np.allclose(arr, arr.T, atol=1e-6):
            raise ValueError(f"{name} is not symmetric")
        if np.linalg.eigvalsh(arr).min() < -1e-8:
            raise ValueError(f"{name} is not positive semi-definite")
    if distribution == "mvt":
        if df is None:
            raise ValueError("distribution='mvt' requires df")
        if float(df) <= 0:
            raise ValueError(f"df must be positive, got {df}")


def count_primitive(jaxpr, name: str) -> int:
    """Count instances of a primitive anywhere in a (nested) jaxpr —
    shared by the O(K)-collective program-size assertions
    (tests/test_parallel_resampling.py) and the pod-scale compile probe
    (benchmarks/compile_scale.py), which must count identically."""
    n = 0
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == name:
            n += 1
        for param in eqn.params.values():
            inner = getattr(param, "jaxpr", None)
            if inner is not None:
                n += count_primitive(inner, name)
            if isinstance(param, (list, tuple)):
                for p_ in param:
                    inner = getattr(p_, "jaxpr", None)
                    if inner is not None:
                        n += count_primitive(inner, name)
    return n
