"""Checkpoint / resume for filter and MCMC state.

The reference has no checkpointing (full history in RAM, one dump at exit —
SURVEY.md §5; its unfinished incremental ``step()`` API is commented out at
``/root/reference/src/run.rcpp.cpp:199-261``). Here the scan carry
``(particles, log_weights, key, t)`` IS the resume point: snapshot every K
steps via orbax, resume by feeding the restored carry back into the scan.

Orbax is used when available; a numpy ``.npz`` fallback keeps the feature
dependency-light (both write the same logical state).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class FilterCheckpoint:
    """Snapshot of a running filter: carry + step counter + log-evidence."""

    def __init__(self, path: str, use_orbax: bool = True):
        self.path = path
        self._orbax = None
        if use_orbax:
            try:
                import orbax.checkpoint as ocp

                self._orbax = ocp
            except Exception:
                self._orbax = None

    def save(self, t: int, particles, log_weights, key, log_evidence) -> str:
        """Write a snapshot for step ``t``; returns the snapshot path."""
        state = {
            "t": np.asarray(t),
            "particles": np.asarray(particles),
            "log_weights": np.asarray(log_weights),
            "key_data": np.asarray(jax.random.key_data(key)),
            "log_evidence": np.asarray(log_evidence),
        }
        if self._orbax is not None:
            ckpt_dir = os.path.join(os.path.abspath(self.path), f"step_{t}")
            ckptr = self._orbax.PyTreeCheckpointer()
            ckptr.save(ckpt_dir, state, force=True)
            return ckpt_dir
        os.makedirs(self.path, exist_ok=True)
        fp = os.path.join(self.path, f"step_{t}.npz")
        np.savez(fp, **state)
        return fp

    def latest(self) -> Optional[str]:
        if not os.path.isdir(self.path):
            return None
        steps = []
        for name in os.listdir(self.path):
            stem = name.replace(".npz", "")
            if stem.startswith("step_"):
                try:
                    steps.append((int(stem.split("_")[1]), name))
                except ValueError:
                    pass
        if not steps:
            return None
        return os.path.join(self.path, max(steps)[1])

    def restore(self, snapshot: Optional[str] = None) -> dict:
        """Load a snapshot (default: latest). Returns dict with t,
        particles, log_weights, key, log_evidence."""
        snapshot = snapshot or self.latest()
        if snapshot is None:
            raise FileNotFoundError(f"no checkpoints under {self.path}")
        if snapshot.endswith(".npz"):
            data = dict(np.load(snapshot))
        else:
            ckptr = self._orbax.PyTreeCheckpointer()
            data = ckptr.restore(snapshot)
        key = jax.random.wrap_key_data(
            jnp.asarray(np.asarray(data["key_data"], np.uint32)))
        return {
            "t": int(data["t"]),
            "particles": jnp.asarray(data["particles"]),
            "log_weights": jnp.asarray(data["log_weights"]),
            "key": key,
            "log_evidence": float(data["log_evidence"]),
        }
