from cusmc_tpu.mcmc.metropolis import (
    MHResult,
    MHState,
    metropolis_hastings_sampler,
    mh_init,
    mh_step,
)

__all__ = [
    "MHResult",
    "MHState",
    "metropolis_hastings_sampler",
    "mh_init",
    "mh_step",
]
