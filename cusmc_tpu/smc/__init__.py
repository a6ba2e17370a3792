from cusmc_tpu.smc.kalman import kalman_filter
from cusmc_tpu.smc.particle_filter import FilterResult, bootstrap_filter
from cusmc_tpu.smc.rbpf import RBPFResult, rao_blackwell_filter

__all__ = ["FilterResult", "RBPFResult", "bootstrap_filter",
           "kalman_filter", "rao_blackwell_filter"]
