"""ctypes binding to the native host symbolic kernels (native/).

The reference's ordering/symbolic layer is C/C++ (bundled AMD wrapped by
src/slam/OrderingMagic.cpp); this module loads the repo's own C++
implementation when built (``make -C native``) and transparently falls back
to the pure-Python versions otherwise.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    path = os.path.join(root, "native", "libslampp_native.so")
    if not os.path.exists(path):
        # try building it (toolchain is available in the target environment)
        try:
            import subprocess

            subprocess.run(
                ["make", "-C", os.path.join(root, "native")],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(path)
        lib.slampp_min_degree_order.restype = ctypes.c_int64
        lib.slampp_min_degree_order.argtypes = [
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def min_degree_order(
    rowptr: np.ndarray,
    colidx: np.ndarray,
    constrained_last: Optional[Sequence[int]] = None,
) -> Optional[np.ndarray]:
    """Native minimum-degree ordering; None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = len(rowptr) - 1
    rowptr = np.ascontiguousarray(rowptr, np.int64)
    colidx = np.ascontiguousarray(colidx, np.int64)
    last = np.ascontiguousarray(list(constrained_last or ()), np.int64)
    perm = np.empty(n, np.int64)

    def p(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))

    rc = lib.slampp_min_degree_order(n, p(rowptr), p(colidx), p(last), len(last), p(perm))
    if rc != 0:
        return None
    return perm
