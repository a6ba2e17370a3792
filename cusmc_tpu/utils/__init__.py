from cusmc_tpu.utils.linalg import (
    chol_sqrt,
    cov_sqrt,
    eigh_sqrt,
    log_det_from_chol,
    tri_solve,
)
