"""Native (C++) host components.

The reference leans on third-party binary extensions in its hot loop
(cython_bbox, lap's C++ JV, torchvision's C++ NMS). The TPU rebuild runs
those on device; the host-side pieces that remain (exact JV for
evaluation tooling, CPU fallback association) are provided by this
first-party C++ module, built on demand with g++ and loaded via ctypes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
# non-.so filename keeps pkgutil from mistaking the shared lib for
# an importable CPython extension module. The binary is never committed:
# it is compiled from lapjv.cpp on first use (and recompiled whenever the
# source is newer), so what runs is always what's in the repo's sources.
_SO = os.path.join(_HERE, "lapjv_c.bin")
_LIB = None


def _build() -> bool:
    src = os.path.join(_HERE, "lapjv.cpp")
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, src],
            check=True, capture_output=True,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    src = os.path.join(_HERE, "lapjv.cpp")
    stale = (
        not os.path.isfile(_SO)
        or os.path.getmtime(_SO) < os.path.getmtime(src)
    )
    if stale and not _build():
        return None
    lib = ctypes.CDLL(_SO)
    lib.lapjv_cost_limit.argtypes = [
        ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_double,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
    ]
    lib.lapjv_cost_limit.restype = ctypes.c_int
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def lapjv(cost: np.ndarray, thresh: float) -> Tuple[np.ndarray, np.ndarray]:
    """Exact assignment with cost-limit gating.

    Returns (row_to_col, col_to_row) int32 arrays with -1 for unmatched,
    identical semantics to ops.assignment.linear_assignment_host but
    ~100x faster for the evaluation inner loops.
    """
    cost = np.ascontiguousarray(cost, np.float64)
    n, m = cost.shape
    r2c = np.empty(n, np.int32)
    c2r = np.empty(m, np.int32)
    lib = _load()
    if lib is None:  # scipy fallback
        from ..ops.assignment import linear_assignment_host

        matches, _, _ = linear_assignment_host(cost, thresh)
        r2c.fill(-1)
        c2r.fill(-1)
        for i, j in matches:
            r2c[i] = j
            c2r[j] = i
        return r2c, c2r
    lib.lapjv_cost_limit(n, m, cost, float(thresh), r2c, c2r)
    return r2c, c2r
