"""Host-side trajectory store (native arena with numpy fallback).

Streams particle history out of HBM in chunks (used by
``cusmc_tpu.smc.streaming``): the device scan emits [K, N, d] blocks, the
store appends them into one preallocated host arena. Native backend:
``native/trajectory_store.cpp``; fallback preallocates the same arena in
numpy. Replaces the reference's full-history Eigen buffers
(``/root/reference/src/run.rcpp.cpp:80-97``).
"""

from __future__ import annotations

import ctypes
from typing import Tuple

import numpy as np

from cusmc_tpu.io.native import get_lib


def _bind_store(lib) -> bool:
    if hasattr(lib, "_store_bound"):
        return True
    try:
        lib.csmc_store_create.argtypes = [ctypes.c_int64, ctypes.c_int64]
        lib.csmc_store_create.restype = ctypes.c_void_p
        lib.csmc_store_append.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                          ctypes.c_int64]
        lib.csmc_store_append.restype = ctypes.c_int
        lib.csmc_store_size.argtypes = [ctypes.c_void_p]
        lib.csmc_store_size.restype = ctypes.c_int64
        lib.csmc_store_data.argtypes = [ctypes.c_void_p]
        lib.csmc_store_data.restype = ctypes.c_void_p
        lib.csmc_store_destroy.argtypes = [ctypes.c_void_p]
        lib.csmc_store_destroy.restype = None
        lib._store_bound = True
        return True
    except AttributeError:
        return False


class TrajectoryStore:
    """Append-only [max_steps, *step_shape] host buffer.

    ``append(block)`` takes [k, *step_shape] numpy arrays; ``view()``
    returns the filled [size, *step_shape] array (zero-copy on the native
    path)."""

    def __init__(self, step_shape: Tuple[int, ...], max_steps: int,
                 dtype=np.float32, force_numpy: bool = False):
        self.step_shape = tuple(step_shape)
        self.max_steps = int(max_steps)
        self.dtype = np.dtype(dtype)
        step_elems = int(np.prod(self.step_shape)) if self.step_shape else 1
        self._step_bytes = step_elems * self.dtype.itemsize
        self._handle = None
        self._lib = None if force_numpy else get_lib()
        if self._lib is not None and _bind_store(self._lib):
            self._handle = self._lib.csmc_store_create(
                self._step_bytes, self.max_steps)
        if self._handle:
            buf = (ctypes.c_char * (self._step_bytes * self.max_steps)
                   ).from_address(self._lib.csmc_store_data(self._handle))
            self._arena = np.frombuffer(buf, dtype=self.dtype).reshape(
                (self.max_steps,) + self.step_shape)
            self._size = None  # tracked natively
        else:
            self._arena = np.empty((self.max_steps,) + self.step_shape,
                                   self.dtype)
            self._size = 0

    @property
    def size(self) -> int:
        if self._handle:
            return int(self._lib.csmc_store_size(self._handle))
        return self._size

    def append(self, block: np.ndarray) -> None:
        block = np.ascontiguousarray(block, dtype=self.dtype)
        if block.shape[1:] != self.step_shape:
            raise ValueError(f"block shape {block.shape[1:]} != "
                             f"{self.step_shape}")
        k = block.shape[0]
        if self.size + k > self.max_steps:
            raise ValueError(f"store full: {self.size}+{k} > {self.max_steps}")
        if self._handle:
            rc = self._lib.csmc_store_append(
                self._handle, block.ctypes.data_as(ctypes.c_void_p), k)
            if rc != 0:
                raise RuntimeError("native append failed")
        else:
            self._arena[self._size:self._size + k] = block
            self._size += k

    def view(self) -> np.ndarray:
        return self._arena[:self.size]

    def close(self) -> None:
        if self._handle:
            # Detach the numpy view before freeing the arena.
            n = self.size
            self._arena = self._arena[:n].copy()
            self._lib.csmc_store_destroy(self._handle)
            self._size = n
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
