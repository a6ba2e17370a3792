from cusmc_tpu.parallel.filter import sharded_bootstrap_filter
from cusmc_tpu.parallel.mcmc import sharded_mh_sampler
from cusmc_tpu.parallel.mesh import (
    CHAIN_AXIS,
    PARTICLE_AXIS,
    make_mesh,
    particle_sharding,
    replicated,
)

__all__ = [
    "CHAIN_AXIS",
    "PARTICLE_AXIS",
    "make_mesh",
    "particle_sharding",
    "replicated",
    "sharded_bootstrap_filter",
    "sharded_mh_sampler",
]
