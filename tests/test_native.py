"""C++ maskops vs the pure-python implementations."""

import numpy as np
import pytest

from cl4wsis_tpu.data import maskrle, native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="libmaskops.so not built")


def test_rle_string_matches_python():
    counts = [3, 5, 0, 2, 10, 7, 1]
    from tests.test_data import _rle_to_string
    s = _rle_to_string(counts)
    assert native.rle_from_string(s) == maskrle.rle_from_string(s) == counts


def test_rle_decode_encode_roundtrip():
    rs = np.random.RandomState(0)
    m = (rs.rand(37, 23) > 0.5).astype(np.uint8)
    counts = native.rle_encode(m)
    np.testing.assert_array_equal(native.rle_decode(counts, 37, 23), m)
    # matches the python decoder
    np.testing.assert_array_equal(maskrle.rle_decode(counts, 37, 23), m)


def test_cc_stats_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rs = np.random.RandomState(1)
    mask = (rs.rand(64, 64) > 0.6).astype(np.uint8)
    labels, stats = native.connected_components_stats(mask, 8)
    n, ref_labels, ref_stats, ref_centroids = \
        cv2.connectedComponentsWithStats(mask, connectivity=8)
    assert len(stats) == n - 1
    got = sorted((a, round(cy, 6), round(cx, 6)) for a, cy, cx in stats)
    want = sorted((ref_stats[k, cv2.CC_STAT_AREA], round(ref_centroids[k][1], 6),
                   round(ref_centroids[k][0], 6)) for k in range(1, n))
    np.testing.assert_allclose(got, want, atol=1e-6)
    # label maps agree up to renumbering
    fg = mask.astype(bool)
    pairs = set(zip(labels[fg].tolist(), ref_labels[fg].tolist()))
    assert len(pairs) == len(stats)


def test_mask_iou_matches_numpy():
    from cl4wsis_tpu.metrics.voc_ap import mask_iou as np_iou
    rs = np.random.RandomState(2)
    a = (rs.rand(3, 16, 16) > 0.5)
    b = (rs.rand(4, 16, 16) > 0.5)
    np.testing.assert_allclose(native.mask_iou(a, b), np_iou(a, b), atol=1e-12)


def test_polygon_against_python():
    # native poly fill is exposed via maskrle when built; direct check of
    # the simple rectangle case through both paths
    m_py = maskrle.polygons_to_mask([[2, 2, 10, 2, 10, 10, 2, 10]], 16, 16)
    assert m_py[5, 5] == 1


# --------- golden: published COCO CRLE rasterization (rleFrPoly) ------------
# Numpy transcription of the published frPoly algorithm (the same semantics
# pycocotools implements; pycocotools itself is not installed here). Used as
# the oracle proving csrc/maskops.cpp::poly_to_mask is bit-exact.

def _frpoly_transcription(xy, h, w):
    scale = 5.0
    k = len(xy) // 2
    x = [int(scale * xy[2 * j] + 0.5) for j in range(k)] + \
        [int(scale * xy[0] + 0.5)]
    y = [int(scale * xy[2 * j + 1] + 0.5) for j in range(k)] + \
        [int(scale * xy[1] + 0.5)]
    u, v = [], []
    for j in range(k):
        xs, xe, ys, ye = x[j], x[j + 1], y[j], y[j + 1]
        dx, dy = abs(xe - xs), abs(ys - ye)
        flip = (dx >= dy and xs > xe) or (dx < dy and ys > ye)
        if flip:
            xs, xe, ys, ye = xe, xs, ye, ys
        if dx >= dy:
            s = 0.0 if dx == 0 else (ye - ys) / dx
            for d in range(dx + 1):
                t = dx - d if flip else d
                u.append(t + xs)
                v.append(int(ys + s * t + 0.5))
        else:
            s = (xe - xs) / dy
            for d in range(dy + 1):
                t = dy - d if flip else d
                v.append(t + ys)
                u.append(int(xs + s * t + 0.5))
    # crossings -> sorted toggle positions (column-major cell index)
    import math
    a = []
    for j in range(1, len(u)):
        if u[j] == u[j - 1]:
            continue
        xd = float(u[j] if u[j] < u[j - 1] else u[j] - 1)
        xd = (xd + 0.5) / scale - 0.5
        if math.floor(xd) != xd or xd < 0 or xd > w - 1:
            continue
        yd = float(v[j] if v[j] < v[j - 1] else v[j - 1])
        yd = (yd + 0.5) / scale - 0.5
        yd = min(max(yd, 0), h)
        a.append(int(xd) * h + int(math.ceil(yd)))
    # sorted-diff alternating RLE == parity of #toggles <= idx
    colmaj = np.zeros(h * w, np.uint8)
    for idx in a:
        if idx < h * w:
            colmaj[idx] ^= 1
    inside = np.cumsum(colmaj) % 2
    return inside.reshape(w, h).T.astype(np.uint8)


@pytest.mark.skipif(not native.available(), reason="libmaskops.so not built")
@pytest.mark.parametrize("seed", range(6))
def test_native_poly_bitexact_vs_frpoly_transcription(seed):
    rs = np.random.RandomState(seed)
    h, w = 37, 43
    n_pts = rs.randint(3, 9)
    # fractional coordinates, some out of bounds to exercise clamping
    xy = (rs.rand(2 * n_pts) * np.array([w + 4, h + 4] * n_pts) - 2).tolist()
    got = native.poly_to_mask([xy], h, w)
    want = _frpoly_transcription(xy, h, w)
    np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(not native.available(), reason="libmaskops.so not built")
def test_native_poly_multi_polygon_or_merge():
    h = w = 20
    p1 = [2, 2, 9, 2, 9, 9, 2, 9]
    p2 = [11, 11, 18, 11, 18, 18, 11, 18]
    both = native.poly_to_mask([p1, p2], h, w)
    expect = _frpoly_transcription(p1, h, w) | _frpoly_transcription(p2, h, w)
    np.testing.assert_array_equal(both, expect)
    # integer-coordinate rectangle also agrees with cv2 fillPoly
    cv2 = pytest.importorskip("cv2")
    cvm = np.zeros((h, w), np.uint8)
    cv2.fillPoly(cvm, [np.asarray(p1, np.int32).reshape(-1, 2)], 1)
    inter = int((both[:10, :10] & cvm[:10, :10]).sum())
    assert inter >= 49  # same rectangle up to <=1px boundary convention
