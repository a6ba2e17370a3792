from cusmc_tpu.models.dlm import DLM

__all__ = ["DLM"]
