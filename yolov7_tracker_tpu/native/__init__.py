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

# ---------------------------------------------------------------------------
# frameloader: multithreaded decode + prefetch (frameloader.cpp)
# ---------------------------------------------------------------------------

_FL_SO = os.path.join(_HERE, "frameloader_c.bin")
_FL_LIB = None
_FL_FAILED = False


def _fl_load() -> Optional[ctypes.CDLL]:
    global _FL_LIB, _FL_FAILED
    if _FL_LIB is not None or _FL_FAILED:
        return _FL_LIB
    src = os.path.join(_HERE, "frameloader.cpp")
    stale = (
        not os.path.isfile(_FL_SO)
        or os.path.getmtime(_FL_SO) < os.path.getmtime(src)
    )
    if stale:
        # system OpenCV (imgcodecs) provides the decoders; include dir
        # is the distro's opencv4 layout
        cmd = ["g++", "-O2", "-shared", "-fPIC", "-pthread",
               "-I/usr/include/opencv4", "-o", _FL_SO, src,
               "-lopencv_imgcodecs", "-lopencv_core"]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except Exception:
            _FL_FAILED = True
            return None
    try:
        lib = ctypes.CDLL(_FL_SO)
    except OSError:
        _FL_FAILED = True
        return None
    lib.fl_open.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
    ]
    lib.fl_open.restype = ctypes.c_void_p
    lib.fl_next.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        ctypes.c_long,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
    ]
    lib.fl_next.restype = ctypes.c_int
    lib.fl_close.argtypes = [ctypes.c_void_p]
    lib.fl_close.restype = None
    _FL_LIB = lib
    return lib


def frameloader_available() -> bool:
    return _fl_load() is not None


class FrameLoader:
    """In-order multithreaded frame decoder (native frameloader.cpp).

    Iterates BGR uint8 HWC arrays for a list of image paths — the same
    contract as cv2.imread — with decode running ahead on a C++ worker
    pool (the native analogue of the reference's DataLoader workers,
    tracker/track.py:130). Use as a context manager or iterate once;
    falls back to synchronous cv2 when the native lib is unavailable.
    """

    def __init__(self, paths, n_threads: int = 4, capacity: int = 8,
                 max_hw: Tuple[int, int] = (2176, 4096),
                 on_error: str = "raise"):
        # max_hw only sizes the INITIAL staging buffer; larger frames
        # grow it on demand (fl_next leaves an oversized frame in the
        # ring and reports its dims, so nothing is dropped)
        # on_error: "raise" aborts on an unreadable image (dataset runs,
        # where a missing frame must not silently shift numbering);
        # "skip" warns and continues (long-running serving, where one
        # truncated camera dump must not kill the stream)
        assert on_error in ("raise", "skip"), on_error
        self.on_error = on_error
        self.paths = list(paths)
        self._lib = _fl_load()
        self._h = None
        self._max_bytes = max_hw[0] * max_hw[1] * 3
        if self._lib is not None and self.paths:
            arr = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths]
            )
            self._h = self._lib.fl_open(
                arr, len(self.paths), int(n_threads), int(capacity)
            )

    def __iter__(self):
        if self._h is None:  # cv2 fallback
            import cv2

            for p in self.paths:
                img = cv2.imread(p)
                if img is None:
                    if self.on_error == "skip":
                        import warnings

                        warnings.warn(f"skipping unreadable frame {p}")
                        continue
                    raise AssertionError(f"failed to read {p}")
                yield img
            return
        buf = np.empty(self._max_bytes, np.uint8)
        hw = np.zeros(2, np.int32)
        consumed = 0
        try:
            while True:
                rc = self._lib.fl_next(
                    self._h, buf, self._max_bytes, hw
                )
                if rc == -2:
                    # frame larger than the staging buffer: it is still
                    # in the ring; grow to its reported size and retry
                    self._max_bytes = int(hw[0]) * int(hw[1]) * 3
                    buf = np.empty(self._max_bytes, np.uint8)
                    rc = self._lib.fl_next(
                        self._h, buf, self._max_bytes, hw
                    )
                if rc == -1:
                    return
                if rc == -3:
                    if self.on_error == "skip":
                        import warnings

                        warnings.warn(
                            "skipping unreadable frame "
                            f"{self.paths[consumed]}"
                        )
                        consumed += 1
                        continue
                    raise AssertionError(
                        f"failed to read {self.paths[consumed]}"
                    )
                assert rc >= 0, f"frameloader rc={rc}"
                consumed += 1
                h, w = int(hw[0]), int(hw[1])
                yield buf[: h * w * 3].reshape(h, w, 3).copy()
        finally:
            self.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    def close(self):
        if self._h is not None:
            self._lib.fl_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
