"""Convergence-driven sampling: extend chains block by block until the
rank-normalized R-hat and multi-chain ESS pass their thresholds.

The reference's MCMC runs a fixed step count with no diagnostics at all
(``/root/reference/src/mcmc.cpp:239-309``); real workflows want "sample
until converged". The driver runs one warmup block with full adaptation,
freezes the adapted quantities (step size, trajectory length, mass
diagonal), then extends the chains in fixed-size blocks — each block is
ONE jitted call reused across blocks (adapted scalars enter as traced
arguments, so there is exactly one compile for the warmup block and one
for all continuation blocks) — checking `rank_normalized_rhat` and
`effective_sample_size_chains` on the accumulated post-warmup draws
after every block.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cusmc_tpu.diagnostics.mcmc import (
    _rank_normalize,
    effective_sample_size_chains,
    rank_normalized_rhat,
)
from cusmc_tpu.mcmc.chees import chees_hmc_sampler
from cusmc_tpu.mcmc.metropolis import metropolis_hastings_sampler
from cusmc_tpu.mcmc.ensemble import stretch_move_sampler
from cusmc_tpu.mcmc.tempering import parallel_tempering_sampler


class ConvergenceRun:
    """Plain host-side result: ``samples`` [T, C, d] post-warmup draws,
    ``rhat`` / ``ess`` [d] final diagnostics, ``blocks`` used,
    ``converged`` bool."""

    def __init__(self, samples, rhat, ess, blocks, converged):
        self.samples = samples
        self.rhat = rhat
        self.ess = ess
        self.blocks = blocks
        self.converged = converged


def sample_to_convergence(
    key: jax.Array,
    log_prob: Callable,
    init_x: jnp.ndarray,
    sampler: str = "chees",
    block_steps: int = 500,
    max_blocks: int = 20,
    rhat_tol: float = 1.01,
    min_ess: float = 400.0,
    step_size: float = 0.2,
    **kwargs,
) -> ConvergenceRun:
    """Sample ``log_prob`` with [C, d] chains until converged.

    ``sampler``: "chees" (preconditioned ChEES-HMC — the auto-tuning
    default), "mh" (random-walk Metropolis), or "pt" (parallel
    tempering — for MULTIMODAL targets, where rank-normalized R-hat is
    exactly the diagnostic that catches missed modes; the warm block
    adapts per-rung step sizes and, if ``adapt_ladder=True`` is passed,
    the ladder; continuation re-injects both), or "stretch" (the
    tune-free affine-invariant ensemble — nothing to adapt, every block
    just continues the walkers). Block 1 adapts; blocks
    2..max_blocks run with everything frozen at the adapted values.
    Diagnostics are computed on all post-warmup draws; the run stops as
    soon as max(R-hat) <= rhat_tol AND min(bulk ESS) >= min_ess.
    ``kwargs`` pass through to the underlying sampler.
    """
    if sampler not in ("chees", "mh", "pt", "stretch"):
        raise ValueError(f"unknown sampler {sampler!r}")

    warm_kw = dict(kwargs)
    # continuation blocks re-inject the adapted values and force
    # num_adapt=0 / keep_samples=True; drop any user-supplied initials
    # for those same knobs (passing both is a TypeError)
    cont_kw = {k: v for k, v in kwargs.items()
               if k not in ("init_traj", "init_var", "init_log_step",
                            "num_adapt", "keep_samples")}
    warm_kw.pop("keep_samples", None)
    if sampler == "stretch":
        warm = jax.jit(lambda k, x: stretch_move_sampler(
            k, log_prob, x, block_steps, keep_samples=False, **warm_kw))
        cont = jax.jit(lambda k, x: stretch_move_sampler(
            k, log_prob, x, block_steps, keep_samples=True, **cont_kw))
    elif sampler == "pt":
        cont_kw.pop("betas", None)
        cont_kw.pop("adapt_ladder", None)
        warm = jax.jit(lambda k, x: parallel_tempering_sampler(
            k, log_prob, x, block_steps, step_size=step_size,
            keep_samples=False, **warm_kw))
        cont = jax.jit(lambda k, x, ls, b: parallel_tempering_sampler(
            k, log_prob, x, block_steps, betas=b, init_log_step=ls,
            num_adapt=0, keep_samples=True, **cont_kw))
    elif sampler == "chees":
        warm = jax.jit(lambda k, x: chees_hmc_sampler(
            k, log_prob, x, block_steps, step_size=step_size,
            keep_samples=False, **warm_kw))
        cont = jax.jit(lambda k, x, ss, h, v: chees_hmc_sampler(
            k, log_prob, x, block_steps, step_size=ss, init_traj=h,
            init_var=v, num_adapt=0, keep_samples=True, **cont_kw))
    else:
        warm = jax.jit(lambda k, x: metropolis_hastings_sampler(
            k, log_prob, x, block_steps, step_size=step_size,
            keep_samples=False, **warm_kw))
        cont = jax.jit(lambda k, x, ss: metropolis_hastings_sampler(
            k, log_prob, x, block_steps, step_size=ss, num_adapt=0,
            keep_samples=True, **cont_kw))

    k_warm, key = jax.random.split(key)
    res = warm(k_warm, init_x)
    x = res.x if sampler == "stretch" else res.state.x

    blocks = []
    rhat = ess = None
    for b in range(max_blocks):
        key, k_b = jax.random.split(key)
        if sampler == "chees":
            res = cont(k_b, x, res.step_size, res.traj_length,
                       res.mass_var)
        elif sampler == "pt":
            res = cont(k_b, x, jnp.log(res.step_size), res.betas)
        elif sampler == "stretch":
            res = cont(k_b, x)
        else:
            res = cont(k_b, x, res.step_size)
        x = res.x if sampler == "stretch" else res.state.x
        blocks.append(np.asarray(res.samples))
        stack = jnp.asarray(np.concatenate(blocks, axis=0))
        rhat = np.asarray(rank_normalized_rhat(stack))
        ess = np.asarray(effective_sample_size_chains(
            _rank_normalize(stack)))
        if rhat.max() <= rhat_tol and ess.min() >= min_ess:
            return ConvergenceRun(np.concatenate(blocks, axis=0), rhat,
                                  ess, b + 1, True)
    return ConvergenceRun(np.concatenate(blocks, axis=0), rhat, ess,
                          max_blocks, False)
