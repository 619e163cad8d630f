"""ctypes bindings for the C++ mask ops (csrc/maskops.cpp).

The library is built on demand: `_load()` runs `make -C csrc` the first time
the .so is missing or older than its source (disable with
CL4WSIS_NO_NATIVE_BUILD=1 — e.g. no compiler on the host). All entry points
degrade gracefully: callers use `available()` or the wrapped functions raise
ImportError and the pure-python paths in data/maskrle.py and
metrics/voc_ap.py take over.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Tuple

import numpy as np

_LIB = None
_BUILD_TRIED = False
_CSRC = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", "csrc"))
_SEARCH = [
    os.path.join(_CSRC, "libmaskops.so"),
    os.path.join(os.path.dirname(__file__), "libmaskops.so"),
]


def _try_build() -> None:
    """Build libmaskops.so from source if absent/stale (once per process)."""
    global _BUILD_TRIED
    if _BUILD_TRIED or os.environ.get("CL4WSIS_NO_NATIVE_BUILD") == "1":
        return
    _BUILD_TRIED = True
    src = os.path.join(_CSRC, "maskops.cpp")
    so = os.path.join(_CSRC, "libmaskops.so")
    if not os.path.exists(src):
        return
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return
    try:
        subprocess.run(["make", "-C", _CSRC], capture_output=True,
                       timeout=120, check=False)
    except (OSError, subprocess.TimeoutExpired):
        pass  # no make/compiler: the pure-python fallbacks take over


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    _try_build()
    for p in _SEARCH:
        p = os.path.abspath(p)
        if os.path.exists(p):
            lib = ctypes.CDLL(p)
            lib.rle_from_string.restype = ctypes.c_int
            lib.rle_encode.restype = ctypes.c_int
            lib.connected_components_stats.restype = ctypes.c_int
            _LIB = lib
            return lib
    raise ImportError("libmaskops.so not built; run `make -C csrc`")


def available() -> bool:
    try:
        _load()
        return True
    except ImportError:
        return False


def _u8(a: np.ndarray):
    a = np.ascontiguousarray(a, np.uint8)
    return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def rle_from_string(s: str) -> List[int]:
    lib = _load()
    buf = np.zeros(len(s) + 1, np.int64)
    n = lib.rle_from_string(s.encode("ascii"), len(s),
                            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                            len(buf))
    return buf[:n].tolist()


def rle_decode(counts, h: int, w: int) -> np.ndarray:
    lib = _load()
    runs = np.ascontiguousarray(counts, np.int64)
    out = np.zeros((h, w), np.uint8)
    lib.rle_decode(runs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                   len(runs), h, w,
                   out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out


def rle_encode(mask: np.ndarray) -> List[int]:
    lib = _load()
    h, w = mask.shape
    m, mp = _u8(mask)
    buf = np.zeros(h * w + 2, np.int64)
    n = lib.rle_encode(mp, h, w,
                       buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                       len(buf))
    return buf[:n].tolist()


def poly_to_mask(polys, h: int, w: int) -> np.ndarray:
    """COCO polygon rasterization, exact published-CRLE (rleFrPoly)
    semantics; polygons OR together like pycocotools merge."""
    lib = _load()
    out = np.zeros((h, w), np.uint8)
    op = out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    for p in polys:
        if len(p) < 6:
            continue
        xy = np.ascontiguousarray(p, np.float64)
        lib.poly_to_mask(xy.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                         len(xy) // 2, h, w, op)
    return out


def connected_components_stats(mask: np.ndarray, connectivity: int = 8,
                               max_comp: int = 4096
                               ) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (labels (h,w) int32 with 0 bg, stats (K,3) [area, cy, cx])."""
    lib = _load()
    h, w = mask.shape
    m, mp = _u8(mask)
    labels = np.zeros((h, w), np.int32)
    stats = np.zeros((max_comp, 3), np.float64)
    k = lib.connected_components_stats(
        mp, h, w, connectivity,
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        stats.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), max_comp)
    if k < 0:
        raise RuntimeError("too many components")
    st = stats[:k]
    out = np.stack([st[:, 0], st[:, 1] / np.maximum(st[:, 0], 1),
                    st[:, 2] / np.maximum(st[:, 0], 1)], axis=1)
    return labels, out


def mask_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lib = _load()
    n, h, w = a.shape
    m = b.shape[0]
    a_, ap = _u8(a.reshape(n, -1))
    b_, bp = _u8(b.reshape(m, -1))
    out = np.zeros((n, m), np.float64)
    lib.mask_iou(ap, n, bp, m, ctypes.c_int64(h * w),
                 out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out
