"""ctypes bindings to the C++ host runtime (libcusmc_host.so).

The reference keeps its IO / buffer management in C++
(``/root/reference/src/io.cpp``, ``src/run.rcpp.cpp:80-97``); our equivalent
native layer lives in ``native/`` and is loaded here. Every entry point has a
pure-Python fallback, so the framework works without the compiled library.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB = None
_TRIED = False


def _find_lib() -> Optional[str]:
    here = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
    for cand in (
        os.path.join(here, "native", "build", "libcusmc_host.so"),
        os.path.join(here, "native", "libcusmc_host.so"),
    ):
        if os.path.exists(cand):
            return cand
    return None


def get_lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _find_lib()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.csmc_csv_dims.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_long),
                                  ctypes.POINTER(ctypes.c_long)]
    lib.csmc_csv_dims.restype = ctypes.c_int
    lib.csmc_csv_read.argtypes = [ctypes.c_char_p,
                                  ctypes.POINTER(ctypes.c_double),
                                  ctypes.c_long, ctypes.c_long]
    lib.csmc_csv_read.restype = ctypes.c_int
    lib.csmc_csv_write.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                   ctypes.POINTER(ctypes.c_double),
                                   ctypes.c_long, ctypes.c_long]
    lib.csmc_csv_write.restype = ctypes.c_int
    _LIB = lib
    return _LIB


def load_csv_native(path: str) -> Optional[np.ndarray]:
    """Parse a headered float CSV with the native loader; None if no lib."""
    lib = get_lib()
    if lib is None:
        return None
    rows = ctypes.c_long()
    cols = ctypes.c_long()
    if lib.csmc_csv_dims(path.encode(), ctypes.byref(rows), ctypes.byref(cols)) != 0:
        raise IOError(f"native csv dims failed for {path}")
    out = np.empty((rows.value, cols.value), dtype=np.float64)
    ptr = out.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    if lib.csmc_csv_read(path.encode(), ptr, rows.value, cols.value) != 0:
        raise IOError(f"native csv read failed for {path}")
    return out


def write_csv_native(path: str, header: str, data: np.ndarray) -> bool:
    """Write a headered float CSV natively; False if no lib."""
    lib = get_lib()
    if lib is None:
        return False
    data = np.ascontiguousarray(data, dtype=np.float64)
    ptr = data.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    rc = lib.csmc_csv_write(path.encode(), header.encode(), ptr,
                            data.shape[0], data.shape[1])
    if rc != 0:
        raise IOError(f"native csv write failed for {path}")
    return True
