from cusmc_tpu.parallel.enkf import sharded_ensemble_kalman_filter
from cusmc_tpu.parallel.filter import sharded_bootstrap_filter
from cusmc_tpu.parallel.mcmc import (
    sharded_chees_sampler,
    sharded_mh_sampler,
    sharded_pt_sampler,
    sharded_stretch_sampler,
)
from cusmc_tpu.parallel.mesh import (
    CHAIN_AXIS,
    PARTICLE_AXIS,
    make_mesh,
    particle_sharding,
    replicated,
)
from cusmc_tpu.parallel.multihost import (
    global_mesh,
    initialize_distributed,
    process_info,
)

__all__ = [
    "CHAIN_AXIS",
    "PARTICLE_AXIS",
    "global_mesh",
    "initialize_distributed",
    "make_mesh",
    "particle_sharding",
    "process_info",
    "replicated",
    "sharded_bootstrap_filter",
    "sharded_ensemble_kalman_filter",
    "sharded_chees_sampler",
    "sharded_mh_sampler",
    "sharded_pt_sampler",
    "sharded_stretch_sampler",
]
