"""Packed (structure-of-arrays) particle ops: state is [d, N], N on lanes.

Why: TPU vector registers are (8, 128) tiles with 128 lanes minor. The
reference-style [N, d] layout puts the tiny state dimension (d=2..128) on
lanes, wasting up to 126/128 of every vector op and driving XLA to pick
catastrophic tilings (measured 25 ms for a [1M,2]x[2,2] matmul on v5e —
vs ~30 us for the same math in [d, N] layout). All hot-loop compute in this
framework therefore runs packed: particles on lanes, state components on
the sublane axis.

``matvec`` is a plain MXU matmul ``A @ X``: measured on v5e at N=1M it
beats an unrolled d^2 vector-FMA formulation at EVERY d (d=2: 13 vs 34 us;
d=8: 19 vs 362 us; d=16: 149 vs 1553 us — the unroll materializes row
intermediates, while the MXU streams [d, N] once at full bandwidth). This
replaces the reference's per-particle tiled CUDA matvecs
(``/root/reference/src/mvn_dist.cu.cpp:33-172``, TILE_SIZE=16).
"""

from __future__ import annotations

import jax.numpy as jnp


def matvec(A: jnp.ndarray, X: jnp.ndarray, out_dtype=None) -> jnp.ndarray:
    """[m, d] @ [d, N] -> [m, N] batched over lanes (MXU).

    ``out_dtype`` sets the accumulation/output type — the mixed-precision
    path feeds bfloat16 operands with float32 accumulation (the MXU's
    native mode), so residuals carry no accumulation rounding on top of
    the stored-state rounding."""
    return jnp.matmul(A, X, preferred_element_type=out_dtype)


def quadform(Linv: jnp.ndarray, R: jnp.ndarray) -> jnp.ndarray:
    """sum_j (Linv @ R)_j^2 over the state axis -> [N].

    The Mahalanobis quadratic form of residuals R [k, N] given the inverse
    Cholesky factor of the covariance (one fused pass; replaces the
    reference's 3-kernel pdf chain ``mvn_dist.cu.cpp:455-668``).
    """
    Z = matvec(Linv, R)
    return jnp.sum(Z * Z, axis=0)
