"""Self-refinement label generation, fully on device.

Re-design of reference ``modules/utils.py:257-385`` (refine_label_generation):
regenerate center/offset/weight targets from the model's OWN predictions —
per new class, per connected component of the predicted seg, run
Panoptic-DeepLab grouping (center NMS + offset clustering + nearest-center
assignment) and emit per-instance gaussians/offsets with confidence
weights center_score x seg_score.

The reference is a per-image, per-class, per-component Python/cv2 loop with
batch=1-only helpers. Here NOTHING loops over classes: the two fixpoint
label propagations run once as multi-label passes (argmax class regions are
disjoint — ops/cc.py connected_components_multilabel), NMS is one pooled
pass over all class channels, and every class's center slots live in ONE
global slot array so a single root-gated assignment + one set of segment
ops produces the final maps. (Round-2 device traces showed first the
per-class CC loops and then the per-class lax.map slot layer dominating the
whole phase-2 step; both are gone.)

Documented approximations vs the reference: NMS windows and offset-cluster
blobs can straddle adjacent components of the same class, and the
>MAXIMUM_NUM_INST check counts detected centers rather than surviving
instance ids — all rare ties in practice.

Defaults mirror the reference CLI: refine_thresh 0.3, nms kernel 41,
beta 3, sigma 6 (``argparser.py:219-222``).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from cl4wsis_tpu.ops import segsort as ss
from cl4wsis_tpu.ops.cc import connected_components_multilabel
from cl4wsis_tpu.ops.grouping import assign_pixels_lanes
from cl4wsis_tpu.ops.labelgen import stamp_centers
from cl4wsis_tpu.ops.peaks import max_pool_same
from cl4wsis_tpu.ops.topk import topk_hier
from cl4wsis_tpu.ops.pseudo_labels import (MAXIMUM_NUM_INST,
                                           MINIMUM_MASK_SIZE, Components,
                                           class_components,
                                           component_stats)


def _global_center_slots(eff, roots, center_map, offset_map,
                         threshold, nms_kernel, beta, max_ctr, max_cluster,
                         cc_iters, num_classes, first_class=0,
                         max_inst_cap=True):
    """Center slots for every class in [first_class, num_classes) in one
    flat array (NC = num_classes - first_class active-range classes).

    Returns dict with (NC*max_ctr + NC*max_cluster,)-shaped slot arrays
    (ys, xs, valid, root, cls — GLOBAL class ids, plus cyf/cxf: the floored
    centroid of each slot's component), the spiked heatmap stack (H, W,
    NC), and the NMS truncation count. Component size/centroid checks are
    per-SLOT component_stats queries (a fused lane compare over the root
    plane) — the per-pixel ok/centroid planes they replace needed the
    full-HW sorted-domain pass (~25 ms/step of sorts + staging copies on
    the round-4 trace) for values only ever read at ~160 slot positions.
    """
    H, W = eff.shape
    HW = H * W
    classes = jnp.arange(first_class, num_classes)    # (NC,) global ids
    nc = num_classes - first_class

    # component-masked heatmaps + pooled NMS for every class in one pass
    fg_all = eff[..., None] == (classes + 1)
    ch_all = center_map[..., first_class:] * fg_all   # (H, W, NC)
    x_nms = jnp.where(ch_all > threshold, ch_all, -1.0)
    hmax = max_pool_same(x_nms[None], nms_kernel)[0]
    x_nms = jnp.where(x_nms == hmax, x_nms, -1.0)     # survivors or -1
    flat_nms = x_nms.transpose(2, 0, 1).reshape(nc, HW)
    # hierarchical exact top-k: plain top_k sorts the whole HW axis
    # (~42 ms/step profiled); see ops/topk.py
    n_vals, n_idx = topk_hier(flat_nms, max_ctr)      # (C, max_ctr)
    n_ys = (n_idx // W).astype(jnp.int32)
    n_xs = (n_idx % W).astype(jnp.int32)
    n_valid = n_vals > 0
    n_root = roots[n_ys, n_xs]
    # NMS centers beyond the slot cap are silently dropped relative to the
    # reference's top_k=10000 (train.py:497); count them so callers surface
    # saturation instead of hiding it. (Cluster-slot overflow is counted
    # below once the weak-CC accept mask exists.)
    nms_counts = jnp.sum((flat_nms > 0).astype(jnp.int32), axis=1)
    truncated = jnp.sum(jnp.maximum(nms_counts - max_ctr, 0))

    # offset-cluster components (modules/utils.py:608-632), all classes in
    # one multi-label pass; stats in ONE sorted-domain pass (no root-table
    # scatters — see ops/pseudo_labels.Components). The element's own class
    # rides the sort as a payload (runs are class-pure), so per-class
    # selection is a flag cumsum in sorted (= ascending-root) order.
    mag = jnp.sqrt(jnp.square(offset_map[..., 0]) +
                   jnp.square(offset_map[..., 1]))
    weak_eff = jnp.where(mag < 2.5, eff, 0).astype(jnp.int32)
    roots_w = connected_components_multilabel(weak_eff, connectivity=4,
                                              num_iters=cc_iters)
    idx = jnp.arange(HW, dtype=jnp.int32)
    # components are class-pure, so the element's class can ride INSIDE
    # the sort key (root*M + cls orders exactly like root): one less
    # payload array through the HW sort — the single largest remaining
    # factory op on the round-4 trace (s32[16, 262144] x 3 at 5.1
    # ms/step). M is a power of two so unpacking is a shift/mask.
    mult = 1 << int(num_classes).bit_length()      # M > num_classes >= cls
    if HW * mult + num_classes < 2 ** 31:
        packed = roots_w.reshape(-1) * mult + weak_eff.reshape(-1)
        spacked, sidxw = ss.sort_by(packed, idx)
        skw = spacked // mult
        sclsw = spacked % mult
    else:  # absurd plane sizes would overflow the packing: 3-array sort
        skw, sidxw, sclsw = ss.sort_by(roots_w.reshape(-1), idx,
                                       weak_eff.reshape(-1))
    startsw = ss.run_starts(skw)
    # fused Pallas run totals on TPU (see class_components note)
    from cl4wsis_tpu.ops.pallas_seg import run_totals1
    area_w, syw, sxw, _ = run_totals1(skw, sidxw // W, sidxw % W,
                                      jnp.zeros_like(skw))
    den_w = jnp.maximum(area_w, 1).astype(jnp.float32)
    cyw_e = syw.astype(jnp.float32) / den_w
    cxw_e = sxw.astype(jnp.float32) / den_w
    accept_w = (skw < HW) & (area_w > 21 - beta) & (area_w < 21 + beta)

    # probe window: select TWICE the cap so the validity checks (heat,
    # component, 100px merge) run on the overflow candidates too — a
    # verified-valid candidate beyond the cap is a genuinely dropped
    # instance and is counted as truncated (the round-2 PARITY cluster-slot
    # blind spot). Candidates failing the checks would have been rejected
    # by the reference too and are NOT counted. Overflow past the 2x window
    # goes unchecked (unbounded accounting would need dense per-root merge
    # distances); a scene saturating the window still reports nonzero.
    k2 = 2 * max_cluster

    def cluster_slots(cls_id):
        fl = startsw & accept_w & (sclsw == cls_id + 1)
        pos = ss.select_flagged(fl, k2)
        posc = jnp.minimum(pos, HW - 1)
        return posc, (pos < HW) & fl[posc]

    # per-class first-k2 accepted components, batched via vmap
    c_pos, c_acc = jax.vmap(cluster_slots)(classes)
    c_ys = jnp.floor(cyw_e[c_pos]).astype(jnp.int32)  # (NC, k2)
    c_xs = jnp.floor(cxw_e[c_pos]).astype(jnp.int32)
    c_root = roots[c_ys, c_xs]
    ch_at = ch_all[c_ys, c_xs, jnp.arange(nc)[:, None]]

    # ONE component_stats query for every slot's component: the size gate
    # (area >= MINIMUM_MASK_SIZE, reference's `ok`) and the floored
    # centroid fallback the caller stamps when the center heat is weak
    q = jnp.concatenate([n_root.reshape(-1), c_root.reshape(-1)])
    area_q, sy_q, sx_q = component_stats(roots, q)
    ok_q = area_q >= MINIMUM_MASK_SIZE
    den_q = jnp.maximum(area_q, 1).astype(jnp.float32)
    cyf_q = jnp.clip(jnp.floor(sy_q.astype(jnp.float32) / den_q), 0, H - 1)
    cxf_q = jnp.clip(jnp.floor(sx_q.astype(jnp.float32) / den_q), 0, W - 1)
    n_sl = n_root.size
    ok_n, ok_c = ok_q[:n_sl].reshape(n_root.shape), \
        ok_q[n_sl:].reshape(c_root.shape)

    n_valid = n_valid & (n_root != HW) & ok_n
    c_valid = c_acc & (ch_at > 0.05) & (c_root != HW) & ok_c
    # merge rule: accept a cluster center only if >100px from every valid
    # NMS center of the same component (same class by root purity)
    d2 = (jnp.square(c_ys[:, :, None] - n_ys[:, None, :]).astype(jnp.float32) +
          jnp.square(c_xs[:, :, None] - n_xs[:, None, :]))
    same = n_valid[:, None, :] & (c_root[:, :, None] == n_root[:, None, :])
    min_d = jnp.min(jnp.where(same, jnp.sqrt(d2), jnp.inf), axis=2)
    c_valid = c_valid & (min_d > 100.0)
    truncated = truncated + jnp.sum(c_valid[:, max_cluster:].astype(jnp.int32))
    cyf_n = cyf_q[:n_sl].reshape(n_root.shape)
    cxf_n = cxf_q[:n_sl].reshape(n_root.shape)
    cyf_c = cyf_q[n_sl:].reshape(c_root.shape)[:, :max_cluster]
    cxf_c = cxf_q[n_sl:].reshape(c_root.shape)[:, :max_cluster]
    c_ys, c_xs = c_ys[:, :max_cluster], c_xs[:, :max_cluster]
    c_root, ch_at = c_root[:, :max_cluster], ch_at[:, :max_cluster]
    c_valid = c_valid[:, :max_cluster]

    # the reference marks cluster centers as 1.0 spikes in the heatmap
    # before reading the per-instance max (modules/utils.py:578-590)
    ch_spiked = ch_all.at[c_ys, c_xs, jnp.arange(nc)[:, None]].set(
        jnp.where(c_valid, 1.0, ch_at))

    cls_ids = jnp.concatenate([
        jnp.repeat(classes, max_ctr), jnp.repeat(classes, max_cluster)])
    slots = {
        "ys": jnp.concatenate([n_ys.reshape(-1), c_ys.reshape(-1)]),
        "xs": jnp.concatenate([n_xs.reshape(-1), c_xs.reshape(-1)]),
        "valid": jnp.concatenate([n_valid.reshape(-1), c_valid.reshape(-1)]),
        "root": jnp.concatenate([n_root.reshape(-1), c_root.reshape(-1)]),
        "cls": cls_ids,
        "cyf": jnp.concatenate([cyf_n.reshape(-1), cyf_c.reshape(-1)]),
        "cxf": jnp.concatenate([cxf_n.reshape(-1), cxf_c.reshape(-1)]),
    }

    if max_inst_cap:
        # drop whole components with too many centers (reference refine
        # skips the contour when n_ins > MAXIMUM_NUM_INST — train only; the
        # eval get_ins_map has no such cap, dataset/utils.py:836-880).
        # Roots are class-pure so one global per-root count matches the
        # per-class rule. An S x S lane compare over the ~120 slots, not an
        # HW-table segment_sum: per_root[root[s]] == #valid slots sharing s's
        # root, for every slot at once.
        v, r = slots["valid"], slots["root"]
        per_root = jnp.sum((v[None, :] & (r[:, None] == r[None, :]))
                           .astype(jnp.int32), axis=1)
        slots["valid"] = v & (per_root <= MAXIMUM_NUM_INST)
    return slots, ch_spiked, truncated


def _px_class_values(eff, ch_spiked, seg_probs_things, first_class):
    """Per-pixel heatmap/prob value of the pixel's OWN class channel.

    One-hot select, not a gather: arbitrary per-pixel gathers ran at
    ~3 GB/s on the profile (~90 ms each here); a masked sum over the few
    class channels is plain fused elementwise work."""
    HW = eff.size
    px_cls = jnp.clip(eff.reshape(-1) - 1 - first_class, 0)
    nc = ch_spiked.shape[-1]
    onehot = px_cls[:, None] == jnp.arange(nc)[None, :]
    val = jnp.sum(jnp.where(onehot, ch_spiked.reshape(HW, nc), 0.0), axis=1)
    prob = jnp.sum(jnp.where(onehot, seg_probs_things.reshape(HW, nc), 0.0),
                   axis=1)
    return val, prob


def _slot_stats(slots, assign, eff, ch_spiked, seg_probs_things, n_slots,
                first_class=0):
    """Per-slot (npix, seg_score, center_score, argmax pixel) keyed by the
    global slot assignment. `ch_spiked` and `seg_probs_things` are sliced
    to the active class range.

    All reductions are fused LANE reduces over the (n_slots+1,) axis —
    ``jax.ops.segment_*`` lowers to an XLA scatter that TPU executes
    serially (~36 ms per segment op over 4M inputs on the round-3 trace;
    four of them were the single biggest cost block of the whole phase-2
    step), while a masked reduce over 121 lanes is plain vectorized work
    the VPU streams at memory speed."""
    H, W = eff.shape
    HW = H * W
    assign_flat = assign.reshape(-1)
    val, prob = _px_class_values(eff, ch_spiked, seg_probs_things,
                                 first_class)
    flat_idx = jnp.arange(HW, dtype=jnp.int32)

    slot_ids = jnp.arange(n_slots + 1)
    hot = assign_flat[:, None] == slot_ids[None, :]       # (HW, S+1) lanes
    npix = jnp.sum(hot.astype(jnp.float32), axis=0)
    psum = jnp.sum(jnp.where(hot, prob[:, None], 0.0), axis=0)
    seg_score = psum / jnp.maximum(npix, 1.0)
    vmax = jnp.max(jnp.where(hot[:, :n_slots], val[:, None], -jnp.inf),
                   axis=0)
    vmax = jnp.concatenate([vmax, jnp.full((1,), -jnp.inf)])
    # argmax pixel (first max, ties by smallest flat index like torch)
    at_max = hot & (val[:, None] >= vmax[None, :] - 1e-12)
    pmax = jnp.min(jnp.where(at_max, flat_idx[:, None], HW * 2), axis=0)
    py = (pmax // W).astype(jnp.float32)
    px = (pmax % W).astype(jnp.float32)
    return npix, seg_score, vmax, py, px


def _compensated_cumsum(x):
    """Inclusive prefix sum of f32 ``x`` carried as double-single
    (hi, lo) pairs (Knuth TwoSum + renormalisation per combine), so a
    downstream difference of two prefixes resolves to ~ulp(difference)
    instead of ~ulp(global prefix). The combine is only approximately
    associative; any combination order ``associative_scan`` picks keeps
    ~2^-48 relative error, which is all we need."""

    def comb(c1, c2):
        h1, l1 = c1
        h2, l2 = c2
        s = h1 + h2
        zz = s - h1
        e = (h1 - (s - zz)) + (h2 - zz)  # TwoSum error term
        lo = l1 + l2 + e
        t = s + lo                        # renormalise
        return t, lo - (t - s)

    return jax.lax.associative_scan(comb, (x, jnp.zeros_like(x)))


def _slot_stats_sorted(slots, assign, eff, ch_spiked, seg_probs_things,
                       n_slots, first_class=0):
    """Sorted-domain variant of :func:`_slot_stats` for WIDE slot axes.

    The lane-reduce form streams (HW, n_slots+1) compare lanes — right at
    training width (S=121, measured neutral vs a fused kernel, round-4
    "pallas_stats" entry) but ~44% of the whole eval forward at
    get_ins_map's S=800 (scripts/bench_eval_ins.py, round 5). Here the cost
    is made slot-width-independent: ONE lexicographic sort by
    (slot, -val, idx) — so each run's head IS the slot's (vmax, argmax
    pixel) — plus a cumsum difference for the prob totals and one
    searchsorted for the run boundaries. No scatters, no (HW, S) planes.

    Matches :func:`_slot_stats` exactly except (a) the argmax-pixel tie
    tolerance (the lane path takes the smallest flat index within 1e-12 of
    the max; this takes the exact max's smallest index) and (b) py/px of
    the trailing "unassigned" bin, which no caller reads (both callers use
    [:n_slots] or ignore py/px).
    """
    H, W = eff.shape
    HW = H * W
    val, prob = _px_class_values(eff, ch_spiked, seg_probs_things,
                                 first_class)
    flat_idx = jnp.arange(HW, dtype=jnp.int32)
    skey, nval, sidx, sprob = jax.lax.sort(
        (assign.reshape(-1).astype(jnp.int32), -val, flat_idx, prob),
        num_keys=3)
    bnd = jnp.searchsorted(skey, jnp.arange(n_slots + 2, dtype=jnp.int32),
                           side="left").astype(jnp.int32)
    npix = (bnd[1:] - bnd[:-1]).astype(jnp.float32)
    # Per-slot prob totals as prefix-sum differences. A plain f32 cumsum
    # reaches ~HW/2 magnitude (1e5 at the 512 val bucket), capping the
    # difference's resolution at ulp(prefix) ~ 1e-2 — enough to reorder
    # near-tied small instances vs the lane oracle's bin-local sums. Carry
    # the prefix in double-single (hi, lo) pairs instead: the scan costs a
    # few extra VPU adds on a 1 MB array (noise next to the sort) and the
    # difference recovers ~ulp(result) resolution.
    chi, clo = _compensated_cumsum(sprob)
    z = jnp.zeros((1,), sprob.dtype)
    chi = jnp.concatenate([z, chi])
    clo = jnp.concatenate([z, clo])
    psum = ((chi[bnd[1:]] - chi[bnd[:-1]]) + (clo[bnd[1:]] - clo[bnd[:-1]]))
    seg_score = psum / jnp.maximum(npix, 1.0)
    first = jnp.clip(bnd[:-1], 0, HW - 1)
    has = npix > 0
    vmax = jnp.where(has, -nval[first], -jnp.inf).at[-1].set(-jnp.inf)
    pmax = jnp.where(has, sidx[first], HW * 2)
    py = (pmax // W).astype(jnp.float32)
    px = (pmax % W).astype(jnp.float32)
    return npix, seg_score, vmax, py, px


def refine_label_slots(seg_probs: jnp.ndarray, center_map: jnp.ndarray,
                       offset_map: jnp.ndarray, label: jnp.ndarray,
                       gt_seg: jnp.ndarray, *, num_classes: int,
                       sigma: int = 6, refine_thresh: float = 0.3,
                       nms_kernel: int = 41, beta: float = 3.0,
                       max_ctr: int = 16, max_cluster: int = 8,
                       cc_iters: int = 64,
                       first_class: int = 0,
                       components=None) -> Dict[str, jnp.ndarray]:
    """Everything of :func:`refine_label_generation` EXCEPT the gaussian
    stamp: the returned dict carries (stamp_valid, stamp_y, stamp_x,
    stamp_cls) slot arrays instead of "center" — batching callers stamp all
    images at once with ops/pallas_stamp.stamp_centers_batched (the vmapped
    per-image stamp scan lowers to batch while-loops, ~65 ms/step on the
    round-4 trace)."""
    H, W = gt_seg.shape
    HW = H * W
    C = num_classes
    n_slots = (C - first_class) * (max_ctr + max_cluster)
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)

    # shared fixpoint pass: every class's components at once (reused from
    # the caller's pseudo-label pass when provided — identical input).
    # Component size/centroid checks are per-slot component_stats queries
    # inside _global_center_slots, not per-pixel planes.
    if components is None:
        components = class_components(gt_seg, label, C, first_class,
                                      cc_iters)
    comp: Components = components
    eff, roots = comp.eff, comp.roots

    slots, ch_spiked, truncated = _global_center_slots(
        eff, roots, center_map, offset_map, refine_thresh,
        nms_kernel, beta, max_ctr, max_cluster, cc_iters, C, first_class)

    # ONE root-gated nearest-center assignment for every class's slots as
    # a fused lane reduce over the S slots (no tables, no gathers). The
    # class-banked form that wins at eval widths (assign_pixels_classbanks,
    # S=800) was device-A/B'd HERE at S=121/bs16 and measured 2.5% SLOWER
    # (132.1 -> 128.8 img/s — the HIGHEST-precision one-hot matmuls sit on
    # the critical path while the narrow lane reduce already overlaps), so
    # training keeps the lanes.
    assign = assign_pixels_lanes(slots["ys"], slots["xs"],
                                 slots["valid"], slots["root"],
                                 offset_map, roots)
    npix, seg_score, vmax, py, px = _slot_stats(
        slots, assign, eff, ch_spiked, seg_probs[..., 1 + first_class:],
        n_slots, first_class)

    center_score = vmax[:n_slots]
    seg_score = seg_score[:n_slots]
    slot_ok = slots["valid"] & (npix[:n_slots] > 0)

    use_seg_center = center_score < refine_thresh
    # floored centroid of the slot's own component (stats query result)
    slot_cyf = slots["cyf"]
    slot_cxf = slots["cxf"]
    out_y = jnp.where(use_seg_center, slot_cyf, py[:n_slots])
    out_x = jnp.where(use_seg_center, slot_cxf, px[:n_slots])
    conf = jnp.where(use_seg_center, seg_score, center_score * seg_score)
    conf = jnp.clip(conf, 0.0, 1.0)

    # pixel maps: weight = conf of own slot, offsets toward slot center.
    # Per-pixel slot lookups as fused one-hot reduces over the small slot
    # axis — even a 121-entry table gather lowers to a ~40 ms/step fusion
    # at 512^2, while compare+select+sum over n_slots+1 lanes is plain
    # vectorized work (the values are exact: exactly one lane is hot).
    slot_conf = jnp.concatenate([jnp.where(slot_ok, conf, 0.0), jnp.zeros((1,))])
    oy_i = jnp.clip(out_y, 0, H - 1).astype(jnp.int32)
    ox_i = jnp.clip(out_x, 0, W - 1).astype(jnp.int32)
    packed = (slot_ok.astype(jnp.int32) * H + oy_i) * W + ox_i
    packed = jnp.concatenate([packed, jnp.zeros((1,), jnp.int32)])
    af = assign.reshape(-1)
    sid = jnp.arange(n_slots + 1)
    hot = af[:, None] == sid[None, :]
    pk = jnp.sum(jnp.where(hot, packed[None, :], 0), axis=1)
    conf_px = jnp.sum(jnp.where(hot, slot_conf[None, :], 0.0), axis=1)
    live_flat = pk >= HW
    rem = (pk - jnp.where(live_flat, HW, 0)).reshape(H, W)
    live_px = live_flat.reshape(H, W)
    weight = (conf_px.reshape(H, W) * live_px)[..., None]
    offset = jnp.stack([((rem // W).astype(jnp.float32) - ys) * live_px,
                        ((rem % W).astype(jnp.float32) - xs) * live_px],
                       axis=-1)

    return {"stamp_valid": slot_ok, "stamp_y": out_y, "stamp_x": out_x,
            "stamp_cls": slots["cls"], "offset": offset, "weight": weight,
            "truncated": truncated}


@partial(jax.jit, static_argnames=(
    "num_classes", "sigma", "refine_thresh", "nms_kernel", "beta",
    "max_ctr", "max_cluster", "cc_iters", "first_class"))
def refine_label_generation(seg_probs: jnp.ndarray, center_map: jnp.ndarray,
                            offset_map: jnp.ndarray, label: jnp.ndarray,
                            gt_seg: jnp.ndarray, *, num_classes: int,
                            sigma: int = 6, refine_thresh: float = 0.3,
                            nms_kernel: int = 41, beta: float = 3.0,
                            max_ctr: int = 16, max_cluster: int = 8,
                            cc_iters: int = 64,
                            first_class: int = 0,
                            components=None) -> Dict[str, jnp.ndarray]:
    """One sample.

    Args:
      seg_probs: (H, W, C+1) softmax of the (TTA) seg output, channels 1..C
        already masked by the image-level label.
      center_map: (H, W, C) predicted center heatmap (image resolution).
      offset_map: (H, W, 2) predicted offsets (y, x).
      label: (C,) one-hot image-level label for NEW classes only.
      gt_seg: (H, W) int argmax seg with old classes zeroed.

    Returns dict(center (H,W,C), offset (H,W,2), weight (H,W,1),
    truncated () — NMS candidates beyond the per-class slot cap).
    """
    out = refine_label_slots(
        seg_probs, center_map, offset_map, label, gt_seg,
        num_classes=num_classes, sigma=sigma, refine_thresh=refine_thresh,
        nms_kernel=nms_kernel, beta=beta, max_ctr=max_ctr,
        max_cluster=max_cluster, cc_iters=cc_iters, first_class=first_class,
        components=components)
    center = stamp_centers(out.pop("stamp_valid"), out.pop("stamp_y"),
                           out.pop("stamp_x"), out.pop("stamp_cls"),
                           num_classes, sigma, gt_seg.shape)
    return dict(out, center=center)
