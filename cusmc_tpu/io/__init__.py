from cusmc_tpu.io.data import (
    demo_model_params,
    generate_y_sim,
    load_csv,
    load_y_sim,
    write_output,
)

__all__ = [
    "demo_model_params",
    "generate_y_sim",
    "load_csv",
    "load_y_sim",
    "write_output",
]
