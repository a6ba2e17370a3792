"""Resampler registry, keyed by the reference's strings plus extensions.

Mirrors ``resamplers_t`` (``/root/reference/inst/include/types.hpp:32-34``;
single "metropolis" entry registered at ``src/mcmc.cpp:293-295``). Every
resampler is ``(key, log_weights[, **kw]) -> ancestors`` — pure, jittable,
usable inside ``lax.scan``.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict

from cusmc_tpu.resampling.classic import (
    multinomial_ancestors,
    residual_ancestors,
    stratified_ancestors,
    systematic_ancestors,
)
from cusmc_tpu.resampling.metropolis import metropolis_ancestors

Resampler = Callable[..., "jax.Array"]  # (key, log_weights) -> int32 [N]

RESAMPLERS: Dict[str, Resampler] = {}


def register_resampler(name: str, fn: Resampler) -> None:
    RESAMPLERS[name] = fn


def get_resampler(name: str, **kwargs) -> Resampler:
    """Look up a resampler by key; kwargs (e.g. num_steps for metropolis)
    are bound statically so the result is a clean (key, logw) -> a fn."""
    if name not in RESAMPLERS:
        raise KeyError(f"unknown resampler {name!r}; have {sorted(RESAMPLERS)}")
    fn = RESAMPLERS[name]
    return functools.partial(fn, **kwargs) if kwargs else fn


register_resampler("metropolis", metropolis_ancestors)
register_resampler("systematic", systematic_ancestors)
register_resampler("stratified", stratified_ancestors)
register_resampler("multinomial", multinomial_ancestors)
register_resampler("residual", residual_ancestors)

__all__ = [
    "RESAMPLERS",
    "get_resampler",
    "register_resampler",
    "metropolis_ancestors",
    "systematic_ancestors",
    "stratified_ancestors",
    "multinomial_ancestors",
    "residual_ancestors",
]
