import jax.numpy as jnp
import numpy as np
import pytest

from cl4wsis_tpu.ops.cc import component_stats, connected_components, select_components
from cl4wsis_tpu.ops.peaks import peak_extract, smoothing
from cl4wsis_tpu.ops.pseudo_labels import pseudo_label_generation

cv2 = pytest.importorskip("cv2")


def _canon(labels):
    """Canonicalize a label map for comparison: map each label to the flat
    index of its first occurrence."""
    labels = np.asarray(labels)
    out = np.full(labels.shape, -1, np.int64)
    seen = {}
    flat = labels.reshape(-1)
    for i, v in enumerate(flat):
        if v not in seen:
            seen[v] = i
        out.reshape(-1)[i] = seen[v]
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cc_matches_cv2_random(seed):
    rs = np.random.RandomState(seed)
    mask = (rs.rand(32, 32) > 0.6).astype(np.uint8)
    ours = np.asarray(connected_components(jnp.asarray(mask), 8, num_iters=16))
    n, ref = cv2.connectedComponents(mask, connectivity=8)
    fg = mask.astype(bool)
    assert (ours[~fg] == 32 * 32).all()
    np.testing.assert_array_equal(_canon(ours[fg]), _canon(ref[fg]))


def test_cc_snake_converges():
    """Serpentine component: worst case for plain propagation; pointer
    jumping must still converge in 16 iters at 64x64."""
    mask = np.zeros((64, 64), np.uint8)
    for r in range(0, 64, 4):
        mask[r, :] = 1
        if (r // 4) % 2 == 0:
            mask[r:r + 4, -1] = 1
        else:
            mask[r:r + 4, 0] = 1
    ours = np.asarray(connected_components(jnp.asarray(mask), 8, num_iters=16))
    fg = mask.astype(bool)
    assert len(np.unique(ours[fg])) == 1  # single component


def test_cc_connectivity4_vs_8():
    mask = np.zeros((8, 8), np.uint8)
    mask[1, 1] = 1
    mask[2, 2] = 1  # diagonal touch
    r8 = np.asarray(connected_components(jnp.asarray(mask), 8, 8))
    r4 = np.asarray(connected_components(jnp.asarray(mask), 4, 8))
    assert r8[1, 1] == r8[2, 2]
    assert r4[1, 1] != r4[2, 2]


def test_component_stats_matches_cv2():
    mask = np.zeros((16, 16), np.uint8)
    mask[2:6, 3:9] = 1
    mask[10:14, 10:15] = 1
    roots = connected_components(jnp.asarray(mask), 8, 8)
    area, cy, cx = (np.asarray(a) for a in component_stats(roots))
    n, ref, stats, centroids = cv2.connectedComponentsWithStats(mask, connectivity=8)
    got = sorted((area[r], cy[r], cx[r]) for r in np.unique(np.asarray(roots))
                 if r != 256)
    want = sorted((stats[k, cv2.CC_STAT_AREA], centroids[k][1], centroids[k][0])
                  for k in range(1, n))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_select_components():
    accept = np.zeros(17, bool)
    accept[[3, 7, 11]] = True
    sel = np.asarray(select_components(jnp.asarray(accept), 5))
    assert sorted(sel[:3].tolist()) == [3, 7, 11]
    assert (sel[3:] == 16).all()


def test_peak_extract_matches_torch():
    torch = pytest.importorskip("torch")
    heat = np.random.RandomState(0).rand(2, 16, 16, 3).astype(np.float32)
    s, ys, xs = (np.asarray(a) for a in peak_extract(jnp.asarray(heat), kernel=5, k=4))
    ht = torch.from_numpy(heat).permute(0, 3, 1, 2)
    hmax = torch.nn.functional.max_pool2d(ht, 5, stride=1, padding=2)
    keep = (hmax == ht).float()
    peak = (ht * keep).view(2, 3, -1)
    ts, ti = torch.topk(peak, 4)
    np.testing.assert_allclose(s, ts.numpy(), atol=1e-6)
    np.testing.assert_array_equal(ys, (ti // 16).numpy())
    np.testing.assert_array_equal(xs, (ti % 16).numpy())


def test_smoothing_matches_torch_avgpool():
    torch = pytest.importorskip("torch")
    x = np.random.RandomState(1).rand(1, 8, 8, 2).astype(np.float32)
    ours = np.asarray(smoothing(jnp.asarray(x)))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = torch.nn.functional.avg_pool2d(xt, 3, stride=1, padding=1)
    np.testing.assert_allclose(ours, ref.permute(0, 2, 3, 1).numpy(), atol=1e-6)


def _reference_pseudo_label_generation(seg_map, points, cls_label, num_classes,
                                       sigma):
    """Numpy/cv2 transcription of modules/utils.py:179-253."""
    size = 6 * sigma + 3
    x = np.arange(0, size, 1, float)
    y = x[:, np.newaxis]
    x0 = y0 = 3 * sigma + 1
    g = np.exp(-((x - x0) ** 2 + (y - y0) ** 2) / (2 * sigma ** 2))

    pts = [[] for _ in range(num_classes)]
    for px, py, cls, conf in points:
        pts[cls].append((px, py))
    H, W = seg_map.shape
    offset = np.zeros((2, H, W), np.float32)
    weight = np.zeros((1, H, W), np.float32)
    center = np.zeros((num_classes, H, W), np.float32)
    yc = np.cumsum(np.ones_like(seg_map, np.float32), 0) - 1
    xc = np.cumsum(np.ones_like(seg_map, np.float32), 1) - 1
    total = 0
    for cls in np.nonzero(cls_label)[0]:
        mask = (seg_map == cls + 1).astype(np.uint8)
        n, labels, stats, centroids = cv2.connectedComponentsWithStats(mask, connectivity=8)
        for k in range(1, n):
            if stats[k, cv2.CC_STAT_AREA] < 20:
                continue
            cx, cy = list(map(int, centroids[k]))
            match = sum(1 for (x_, y_) in pts[cls] if labels[y_, x_] == k)
            if match == 1:
                total += 1
                ul = cx - 3 * sigma - 1, cy - 3 * sigma - 1
                br = cx + 3 * sigma + 2, cy + 3 * sigma + 2
                c, d = max(0, -ul[0]), min(br[0], W) - ul[0]
                a, b = max(0, -ul[1]), min(br[1], H) - ul[1]
                cc_, dd = max(0, ul[0]), min(br[0], W)
                aa, bb = max(0, ul[1]), min(br[1], H)
                center[cls, aa:bb, cc_:dd] = np.maximum(center[cls, aa:bb, cc_:dd],
                                                        g[a:b, c:d])
                mi = np.where(labels == k)
                weight[0][mi] = 1
                offset[0][mi] = cy - yc[mi]
                offset[1][mi] = cx - xc[mi]
    return center, offset, weight, total


def test_pseudo_label_generation_matches_reference():
    H = W = 48
    C = 4
    seg = np.zeros((H, W), np.int32)
    seg[4:14, 4:20] = 2    # class 2: one peak -> accepted
    seg[20:40, 6:30] = 3   # class 3: two peaks -> rejected
    seg[42:46, 40:46] = 2  # class 2, second comp: no peak -> rejected
    seg[0:3, 44:48] = 4    # class 4: too small (12 px) -> rejected

    K = 5
    peak_ys = np.zeros((C, K), np.int32)
    peak_xs = np.zeros((C, K), np.int32)
    peak_valid = np.zeros((C, K), bool)
    # class 2 (index 1): one peak inside comp 1
    peak_ys[1, 0], peak_xs[1, 0], peak_valid[1, 0] = 8, 10, True
    # class 3 (index 2): two peaks inside the same comp
    peak_ys[2, 0], peak_xs[2, 0], peak_valid[2, 0] = 25, 10, True
    peak_ys[2, 1], peak_xs[2, 1], peak_valid[2, 1] = 30, 20, True
    # class 4 (index 3): peak inside the small comp
    peak_ys[3, 0], peak_xs[3, 0], peak_valid[3, 0] = 1, 45, True

    cls_label = np.array([0, 1, 1, 1], np.float32)

    c, o, w, m, _ = pseudo_label_generation(
        jnp.asarray(seg), jnp.asarray(peak_ys), jnp.asarray(peak_xs),
        jnp.asarray(peak_valid), jnp.asarray(cls_label),
        num_classes=C, sigma=3, max_comp=8)

    points = [(10, 8, 1, 0.9), (10, 25, 2, 0.9), (20, 30, 2, 0.9), (45, 1, 3, 0.9)]
    rc, ro, rw, rm = _reference_pseudo_label_generation(seg, points, cls_label, C, 3)

    assert int(m) == rm == 1
    np.testing.assert_allclose(np.asarray(c), rc.transpose(1, 2, 0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(o)[..., 0], ro[0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(o)[..., 1], ro[1], atol=1e-5)
    np.testing.assert_allclose(np.asarray(w)[..., 0], rw[0], atol=1e-5)


def test_pseudo_label_generation_first_class_equivalent():
    """Skipping inactive old classes must not change the output."""
    H = W = 32
    C = 5
    seg = np.zeros((H, W), np.int32)
    seg[4:20, 4:20] = 4  # class index 3 (a "new" class)
    peak_ys = np.zeros((C, 3), np.int32)
    peak_xs = np.zeros((C, 3), np.int32)
    peak_valid = np.zeros((C, 3), bool)
    peak_ys[3, 0], peak_xs[3, 0], peak_valid[3, 0] = 10, 10, True
    cls_label = np.array([0, 0, 0, 1, 0], np.float32)
    full = pseudo_label_generation(
        jnp.asarray(seg), jnp.asarray(peak_ys), jnp.asarray(peak_xs),
        jnp.asarray(peak_valid), jnp.asarray(cls_label),
        num_classes=C, sigma=3, max_comp=4)
    skip = pseudo_label_generation(
        jnp.asarray(seg), jnp.asarray(peak_ys), jnp.asarray(peak_xs),
        jnp.asarray(peak_valid), jnp.asarray(cls_label),
        num_classes=C, sigma=3, max_comp=4, first_class=2)
    for a, b in zip(full, skip):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_cc_multilabel_equals_per_class():
    """ONE multi-label pass == per-class boolean CC, exactly (same roots)."""
    from cl4wsis_tpu.ops.cc import (connected_components,
                                    connected_components_multilabel)
    rs = np.random.RandomState(7)
    for conn in (4, 8):
        cls_map = rs.randint(0, 4, (40, 40)).astype(np.int32)
        ml = np.asarray(connected_components_multilabel(
            jnp.asarray(cls_map), connectivity=conn))
        for c in (1, 2, 3):
            mask = cls_map == c
            ref = np.asarray(connected_components(jnp.asarray(mask),
                                                  connectivity=conn))
            np.testing.assert_array_equal(ml[mask], ref[mask])
        assert (ml[cls_map == 0] == 40 * 40).all()


def test_cc_multilabel_spiral_converges():
    """Hop-free multilabel CC must still reach exact roots on a long spiral
    (worst-case geodesic for run-propagating scans)."""
    from cl4wsis_tpu.ops.cc import (connected_components,
                                    connected_components_multilabel)
    n = 65
    cls = np.zeros((n, n), np.int32)
    # square spiral of class 2 plus scattered class-1 distractors
    y, x = 0, 0
    dy, dx = 0, 1
    lo, hi = 0, n - 1
    while lo <= hi:
        for xx in range(lo, hi + 1):
            cls[lo, xx] = 2
        for yy in range(lo + 2, hi + 1):
            cls[yy, hi] = 2
        for xx in range(hi - 2, lo + 1, -1):
            cls[hi, xx] = 2
        for yy in range(hi - 2, lo + 3, -1):
            cls[yy, lo + 2] = 2
        lo += 4
        hi -= 4
    cls[1::8, 1::8] = np.where(cls[1::8, 1::8] == 0, 1, cls[1::8, 1::8])
    ml = np.asarray(connected_components_multilabel(jnp.asarray(cls),
                                                    connectivity=8))
    for c in (1, 2):
        m = cls == c
        ref = np.asarray(connected_components(jnp.asarray(m), connectivity=8,
                                              num_iters=4 * n))
        np.testing.assert_array_equal(ml[m], ref[m])


def test_cc_adversarial_percolation_fixpoint():
    """Dense random masks produce maze-like components whose geodesics
    exceed any small fixed iteration count; the fixpoint loop must still
    give the exact cv2 partition (regression: a fixed 16 rounds silently
    under-converged here)."""
    rs = np.random.RandomState(0)
    mask = (rs.rand(64, 128) > 0.6).astype(np.uint8)
    ours = np.asarray(connected_components(jnp.asarray(mask), 8))
    n, ref = cv2.connectedComponents(mask, connectivity=8)
    fg = mask.astype(bool)
    np.testing.assert_array_equal(_canon(ours[fg]), _canon(ref[fg]))
