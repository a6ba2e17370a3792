"""Structural time-series (DLM) builders: local level, trend, seasonal.

The reference takes raw (F, G, V, W) matrices (``/root/reference/src/
run.rcpp.cpp:58-62``) and leaves their construction to the user; R users of
DLM packages expect named components composable by superposition. These
builders return the standard block forms (West & Harrison 1997):

    local_level():        x = [mu],            G = [1]
    local_linear_trend(): x = [mu, beta],      G = [[1,1],[0,1]]
    seasonal(s):          s-1 seasonal-effect states, sum-to-zero rotation

``combine`` superposes components block-diagonally and concatenates their
observation rows (the observation is the SUM of component levels).
Everything returns a plain ``DLM`` — all filters/smoothers/samplers in the
framework apply unchanged.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from cusmc_tpu.models.dlm import DLM


class Component:
    """A structural block: transition G [d,d], observation row f [d],
    state-noise variances diag w [d], and a name."""

    def __init__(self, name: str, G: np.ndarray, f: np.ndarray,
                 w: np.ndarray, m0: Optional[np.ndarray] = None,
                 c0: Optional[np.ndarray] = None):
        self.name = name
        self.G = np.asarray(G, np.float64)
        self.f = np.asarray(f, np.float64)
        self.w = np.asarray(w, np.float64)
        d = self.G.shape[0]
        self.m0 = np.zeros(d) if m0 is None else np.asarray(m0, np.float64)
        self.c0 = (np.full(d, 1.0) if c0 is None
                   else np.asarray(c0, np.float64))


def local_level(level_var: float = 0.01, init_level: float = 0.0,
                init_var: float = 1.0) -> Component:
    """Random-walk level: mu_t = mu_{t-1} + w, w ~ N(0, level_var)."""
    return Component("level", np.eye(1), np.ones(1),
                     np.asarray([level_var]), np.asarray([init_level]),
                     np.asarray([init_var]))


def local_linear_trend(level_var: float = 0.01, slope_var: float = 0.001,
                       init_level: float = 0.0, init_slope: float = 0.0,
                       init_var: float = 1.0) -> Component:
    """Level + slope: mu_t = mu_{t-1} + beta_{t-1} + w1, beta random walk."""
    G = np.asarray([[1.0, 1.0], [0.0, 1.0]])
    return Component("trend", G, np.asarray([1.0, 0.0]),
                     np.asarray([level_var, slope_var]),
                     np.asarray([init_level, init_slope]),
                     np.full(2, init_var))


def seasonal(period: int, seasonal_var: float = 0.001,
             init_var: float = 1.0) -> Component:
    """Sum-to-zero seasonal of the given period: s-1 states with the
    standard rotation G = [[-1...-1],[I 0]]; observation reads the first
    state."""
    if period < 2:
        raise ValueError("seasonal period must be >= 2")
    d = period - 1
    G = np.zeros((d, d))
    G[0, :] = -1.0
    if d > 1:
        G[1:, :-1] = np.eye(d - 1)
    f = np.zeros(d)
    f[0] = 1.0
    w = np.zeros(d)
    w[0] = seasonal_var  # noise enters the current seasonal effect only
    return Component(f"seasonal{period}", G, f, w, np.zeros(d),
                     np.full(d, init_var))


def combine(components: Sequence[Component], obs_var: float = 0.1,
            df=None, noise: str = "mvn", dtype=jnp.float32) -> DLM:
    """Superpose components into one univariate-observation DLM.

    State = concatenation of component states; y = sum of component
    observation rows + N(0, obs_var) (or Student-T with ``noise='mvt'``).
    """
    if not components:
        raise ValueError("need at least one component")
    ds = [c.G.shape[0] for c in components]
    d = sum(ds)
    G = np.zeros((d, d))
    f = np.zeros(d)
    w = np.zeros(d)
    m0 = np.zeros(d)
    c0 = np.zeros(d)
    at = 0
    for c, dc in zip(components, ds):
        G[at:at + dc, at:at + dc] = c.G
        f[at:at + dc] = c.f
        w[at:at + dc] = c.w
        m0[at:at + dc] = c.m0
        c0[at:at + dc] = c.c0
        at += dc
    # Zero state-noise entries get a tiny floor: the filter samples with a
    # covariance square root, which must exist.
    w = np.maximum(w, 1e-12)
    return DLM.create(
        F=f[None, :], G=G, m0=m0, C0=np.diag(c0), V=np.asarray([[obs_var]]),
        W=np.diag(w), df=df, noise=noise, dtype=dtype)
