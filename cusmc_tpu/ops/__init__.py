from cusmc_tpu.ops.packed import matvec, quadform
from cusmc_tpu.ops.random import fast_chi2, fast_gamma

__all__ = ["fast_chi2", "fast_gamma", "matvec", "quadform"]
