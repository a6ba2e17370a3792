from cusmc_tpu.models.base import (
    CustomSSM,
    normalize_time_hook,
    supports_packed,
)
from cusmc_tpu.models.clgssm import CLGSSM
from cusmc_tpu.models.dlm import DLM
from cusmc_tpu.models.stochvol import StochasticVolatility
from cusmc_tpu.models.ungm import UNGM

__all__ = ["CLGSSM", "CustomSSM", "DLM", "StochasticVolatility", "UNGM",
           "normalize_time_hook", "supports_packed"]
