from cusmc_tpu.smc.kalman import kalman_filter
from cusmc_tpu.smc.particle_filter import FilterResult, bootstrap_filter

__all__ = ["FilterResult", "bootstrap_filter", "kalman_filter"]
