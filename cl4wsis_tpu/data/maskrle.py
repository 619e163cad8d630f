"""COCO mask decoding without pycocotools.

Replaces the pycocotools C extension used by the reference's datasets
(``dataset/voc.py:295-305``, ``dataset/coco.py:59-107``): compressed-RLE
string decoding (rleFrString semantics, column-major runs), uncompressed
RLE, and polygon rasterization. Polygon fill uses cv2 when available (the
reference's pycocotools uses its own 5x-upsampled scanline; boundary pixels
can differ by <=1px) with a numpy scanline fallback. A C++ fast path can be
plugged in via cl4wsis_tpu.data.native when built.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Union

import numpy as np

try:
    import cv2
    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False


def rle_from_string(s: Union[str, bytes]) -> List[int]:
    """Decode a COCO compressed-RLE counts string to run lengths."""
    if isinstance(s, bytes):
        s = s.decode("ascii")
    cnts: List[int] = []
    p = 0
    while p < len(s):
        x = 0
        k = 0
        more = True
        while more:
            c = ord(s[p]) - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            p += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(cnts) > 2:
            x += cnts[-2]
        cnts.append(x)
    return cnts


def rle_decode(counts: Sequence[int], h: int, w: int) -> np.ndarray:
    """Run lengths (column-major, starting with 0s) -> (h, w) uint8 mask."""
    counts = np.asarray(counts, np.int64)
    total = int(counts.sum())
    vals = np.zeros(len(counts), np.uint8)
    vals[1::2] = 1
    flat = np.repeat(vals, counts)
    if total < h * w:
        flat = np.concatenate([flat, np.zeros(h * w - total, np.uint8)])
    return flat[:h * w].reshape(w, h).T  # column-major


def rle_encode(mask: np.ndarray) -> Dict:
    """Binary mask -> uncompressed RLE dict (column-major counts)."""
    h, w = mask.shape
    flat = np.asarray(mask, np.uint8).T.reshape(-1)
    change = np.nonzero(np.diff(flat))[0] + 1
    idx = np.concatenate([[0], change, [len(flat)]])
    counts = np.diff(idx).tolist()
    if flat[0] == 1:
        counts = [0] + counts
    return {"size": [h, w], "counts": counts}


def polygons_to_mask(polys: Sequence[Sequence[float]], h: int, w: int) -> np.ndarray:
    """Rasterize COCO polygons ([x0,y0,x1,y1,...] lists) to a (h, w) mask.

    Default path is the C++ exact-CRLE rasterizer (bit-identical to
    pycocotools' rleFrPoly, golden-tested in tests/test_native.py); cv2
    fillPoly (<=1px boundary difference) and a numpy scanline serve as
    fallbacks when libmaskops.so isn't built."""
    try:
        from cl4wsis_tpu.data import native
        if native.available():
            return native.poly_to_mask(polys, h, w)
    except Exception:  # pragma: no cover
        pass
    mask = np.zeros((h, w), np.uint8)
    if _HAS_CV2:
        pts = [np.asarray(p, np.float64).reshape(-1, 2).round().astype(np.int32)
               for p in polys if len(p) >= 6]
        if pts:
            cv2.fillPoly(mask, pts, 1)
        return mask
    # numpy even-odd scanline fallback
    for p in polys:
        if len(p) < 6:
            continue
        xs = np.asarray(p[0::2], np.float64)
        ys = np.asarray(p[1::2], np.float64)
        sub = np.zeros((h, w), np.uint8)
        for y in range(h):
            yc = y + 0.5
            x_cross = []
            n = len(xs)
            for i in range(n):
                x1, y1 = xs[i], ys[i]
                x2, y2 = xs[(i + 1) % n], ys[(i + 1) % n]
                if (y1 <= yc < y2) or (y2 <= yc < y1):
                    x_cross.append(x1 + (yc - y1) * (x2 - x1) / (y2 - y1))
            x_cross.sort()
            for j in range(0, len(x_cross) - 1, 2):
                lo = int(np.ceil(x_cross[j] - 0.5))
                hi = int(np.floor(x_cross[j + 1] - 0.5))
                sub[y, max(lo, 0):min(hi + 1, w)] = 1
        mask |= sub
    return mask


def ann_to_mask(ann: Dict, h: int, w: int) -> np.ndarray:
    """pycocotools coco.annToMask equivalent (C++ fast path when built)."""
    seg = ann["segmentation"]
    if isinstance(seg, list):
        return polygons_to_mask(seg, h, w)
    counts = seg["counts"]
    try:
        from cl4wsis_tpu.data import native
        if native.available():
            if isinstance(counts, (str, bytes)):
                counts = native.rle_from_string(
                    counts.decode() if isinstance(counts, bytes) else counts)
            return native.rle_decode(counts, seg["size"][0], seg["size"][1])
    except Exception:
        pass
    if isinstance(counts, (str, bytes)):
        counts = rle_from_string(counts)
    return rle_decode(counts, seg["size"][0], seg["size"][1])
