"""Bundled demo dataset + CSV IO.

Capability parity with the reference's bundled data and result export:
- ``y_sim``: a 1001-step, d=2 DLM observation trace (reference
  ``data_raw/y_t.csv`` -> R object ``y_sim`` via ``data_raw/data.R:2-4``).
  Ours is regenerated from the same model family with our own RNG — the
  oracle (Kalman filter) is closed-form for any such trace, so the exact
  numbers are immaterial.
- ``write_output``: mirrors ``writeOutput`` (``/root/reference/src/io.cpp:7-43``),
  which dumps ``y_t.csv`` (observations) and ``x_t_N{p}.csv`` (first-particle
  weight + tracked particle p's trajectory per step).

A C++ fast path for bulk CSV parse/serialize lives in ``cusmc_tpu.io.native``
(this module falls back to numpy when the shared library is absent).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

_DATA_DIR = os.path.join(os.path.dirname(__file__), "_data")
_Y_SIM_PATH = os.path.join(_DATA_DIR, "y_sim.csv")


def demo_model_params(d: int = 2, dtype=np.float64) -> dict:
    """The demo DLM used for the bundled trace: a slowly-rotating,
    slightly-damped latent state observed directly with small noise
    (same family as the reference generator, ``src/mcmc.cpp:6-42``, which
    uses caller-supplied F, G and 0.001-scaled identity noise)."""
    theta = 0.05
    rot = np.eye(d, dtype=dtype)
    rot[0, 0] = np.cos(theta)
    rot[0, 1] = -np.sin(theta)
    rot[1, 0] = np.sin(theta)
    rot[1, 1] = np.cos(theta)
    return dict(
        F=np.eye(d, dtype=dtype),
        G=(0.999 * rot).astype(dtype),
        m0=np.zeros(d, dtype=dtype),
        C0=np.eye(d, dtype=dtype),
        V=(0.001 * np.eye(d, dtype=dtype)),
        W=(0.001 * np.eye(d, dtype=dtype)),
    )


def generate_y_sim(path: str = _Y_SIM_PATH, num_steps: int = 1001,
                   seed: int = 0) -> np.ndarray:
    """Generate and write the bundled trace (header ``y0,y1``, zero first
    row — same shape/format as the reference ``data_raw/y_t.csv``)."""
    import jax

    from cusmc_tpu.models.dlm import DLM

    params = demo_model_params()
    model = DLM.create(noise="mvn", dtype=np.float32, **params)
    _, ys = model.simulate(jax.random.key(seed), num_steps)
    ys = np.asarray(ys)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    header = ",".join(f"y{j}" for j in range(ys.shape[1]))
    np.savetxt(path, ys, delimiter=",", header=header, comments="", fmt="%.6g")
    return ys


def load_csv(path: str) -> np.ndarray:
    """Load a headered CSV of floats -> [rows, cols] float64 array.
    Uses the native C++ parser when available."""
    try:
        from cusmc_tpu.io.native import load_csv_native

        out = load_csv_native(path)
        if out is not None:
            return out
    except Exception:
        pass
    return np.genfromtxt(path, delimiter=",", skip_header=1, dtype=np.float64)


def load_y_sim(path: Optional[str] = None) -> np.ndarray:
    """The bundled observation trace [T, 2] (T=1001, first row zeros).
    Generated on first use if absent."""
    path = path or _Y_SIM_PATH
    if not os.path.exists(path):
        if path != _Y_SIM_PATH:
            raise FileNotFoundError(path)
        generate_y_sim(path)
    return load_csv(path)


def write_sim_output(out_dir: str, prior_x: np.ndarray, ys: np.ndarray,
                     weights: np.ndarray, posterior_x: np.ndarray,
                     p: int = 0) -> None:
    """Export a simulated run's traces; mirrors ``writeOutput_ysim``
    (``src/io.cpp:45-87``): latent prior path, observations, and tracked
    posterior-particle trajectory."""
    os.makedirs(out_dir, exist_ok=True)
    prior_x = np.asarray(prior_x)
    d = prior_x.shape[1]
    header = ",".join(f"x{j}" for j in range(d))
    np.savetxt(os.path.join(out_dir, "prior_x_t.csv"), prior_x,
               delimiter=",", header=header, comments="", fmt="%.6g")
    write_output(out_dir, ys, weights, posterior_x, p)


def write_output(out_dir: str, ys: np.ndarray, weights: np.ndarray,
                 posterior_x: np.ndarray, p: int = 0) -> None:
    """Export run results; mirrors ``writeOutput`` (``src/io.cpp:7-43``):
    ``y_t.csv`` (observations) and ``x_t_N{p}.csv`` with columns
    ``w,x...`` = first-particle weight then particle p's state per step."""
    os.makedirs(out_dir, exist_ok=True)
    ys = np.asarray(ys)
    weights = np.asarray(weights)
    posterior_x = np.asarray(posterior_x)
    d = ys.shape[1]
    header = ",".join(f"y{j}" for j in range(d))
    np.savetxt(os.path.join(out_dir, "y_t.csv"), ys, delimiter=",",
               header=header, comments="", fmt="%.6g")
    tracked = np.concatenate([weights[:, :1], posterior_x[:, p, :]], axis=1)
    np.savetxt(os.path.join(out_dir, f"x_t_N{p}.csv"), tracked, delimiter=",",
               header="w," + ",".join(["x"] * posterior_x.shape[2]),
               comments="", fmt="%.6g")
