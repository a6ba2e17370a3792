from cusmc_tpu.models.base import CustomSSM, supports_packed
from cusmc_tpu.models.clgssm import CLGSSM
from cusmc_tpu.models.dlm import DLM
from cusmc_tpu.models.stochvol import StochasticVolatility

__all__ = ["CLGSSM", "CustomSSM", "DLM", "StochasticVolatility",
           "supports_packed"]
