from cusmc_tpu.mcmc.adaptive import AMResult, AMState, adaptive_mh_sampler
from cusmc_tpu.mcmc.hmc import (
    HMCResult,
    HMCState,
    hmc_init,
    hmc_sampler,
    hmc_step,
)
from cusmc_tpu.mcmc.mala import (
    MALAResult,
    MALAState,
    mala_init,
    mala_sampler,
    mala_step,
)
from cusmc_tpu.mcmc.driver import ConvergenceRun, sample_to_convergence
from cusmc_tpu.mcmc.ensemble import EnsembleResult, stretch_move_sampler
from cusmc_tpu.mcmc.chees import (
    ChEESResult,
    ChEESState,
    chees_hmc_sampler,
)
from cusmc_tpu.mcmc.tempering import (
    PTResult,
    PTState,
    geometric_ladder,
    parallel_tempering_sampler,
)
from cusmc_tpu.mcmc.metropolis import (
    MHResult,
    MHState,
    metropolis_hastings_sampler,
    mh_init,
    mh_step,
)

__all__ = [
    "EnsembleResult",
    "stretch_move_sampler",
    "ConvergenceRun",
    "sample_to_convergence",
    "ChEESResult",
    "ChEESState",
    "chees_hmc_sampler",
    "PTResult",
    "PTState",
    "geometric_ladder",
    "parallel_tempering_sampler",
    "AMResult",
    "AMState",
    "HMCResult",
    "HMCState",
    "MALAResult",
    "MALAState",
    "MHResult",
    "MHState",
    "adaptive_mh_sampler",
    "hmc_init",
    "hmc_sampler",
    "hmc_step",
    "mala_init",
    "mala_sampler",
    "mala_step",
    "metropolis_hastings_sampler",
    "mh_init",
    "mh_step",
]
