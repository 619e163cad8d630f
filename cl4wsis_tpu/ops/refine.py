"""Self-refinement label generation, fully on device.

Re-design of reference ``modules/utils.py:257-385`` (refine_label_generation):
regenerate center/offset/weight targets from the model's OWN predictions —
per new class, per connected component of the predicted seg, run
Panoptic-DeepLab grouping (center NMS + offset clustering + nearest-center
assignment) and emit per-instance gaussians/offsets with confidence
weights center_score x seg_score.

The reference is a per-image, per-class, per-component Python/cv2 loop with
batch=1-only helpers; here the per-component structure is encoded in center
"roots" so one global grouping pass per image handles every class and
component simultaneously (documented approximations vs the reference:
NMS windows and offset-cluster blobs can straddle adjacent components of
the same class, and the >MAXIMUM_NUM_INST check counts detected centers
rather than surviving instance ids — all rare ties in practice).

Defaults mirror the reference CLI: refine_thresh 0.3, nms kernel 41,
beta 3, sigma 6 (``argparser.py:219-222``).
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp

from cl4wsis_tpu.ops.cc import component_stats, connected_components
from cl4wsis_tpu.ops.grouping import (assign_pixels, cluster_peaks,
                                      count_nms_peaks, find_instance_centers)
from cl4wsis_tpu.ops.labelgen import stamp_centers
from cl4wsis_tpu.ops.pseudo_labels import MAXIMUM_NUM_INST, MINIMUM_MASK_SIZE


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
                            first_class: int = 0) -> Dict[str, jnp.ndarray]:
    """One sample.

    Args:
      seg_probs: (H, W, C+1) softmax of the (TTA) seg output, channels 1..C
        already masked by the image-level label.
      center_map: (H, W, C) predicted center heatmap (image resolution).
      offset_map: (H, W, 2) predicted offsets (y, x).
      label: (C,) one-hot image-level label for NEW classes only.
      gt_seg: (H, W) int argmax seg with old classes zeroed.

    Returns dict(center (H,W,C), offset (H,W,2), weight (H,W,1)).
    """
    H, W = gt_seg.shape
    HW = H * W
    S = max_ctr + max_cluster  # center slots per class
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    flat_idx = (ys * W + xs).reshape(-1).astype(jnp.int32)

    def per_class(cls_idx):
        active = label[cls_idx] > 0
        fg = (gt_seg == cls_idx + 1) & active
        roots = connected_components(fg, connectivity=8, num_iters=cc_iters)
        area, comp_cy, comp_cx = component_stats(roots)
        comp_ok = area >= MINIMUM_MASK_SIZE

        ch = center_map[..., cls_idx] * fg  # component-masked heatmap (union)

        # NMS centers
        n_ys, n_xs, n_valid = find_instance_centers(
            ch, threshold=refine_thresh, nms_kernel=nms_kernel, max_ctr=max_ctr)
        n_root = roots[n_ys, n_xs]
        n_valid = n_valid & (n_root != HW) & comp_ok[n_root]

        # offset-cluster centers, gated by heatmap > 0.05 at the centroid
        c_ys, c_xs, c_valid = cluster_peaks(offset_map, fg, beta=beta,
                                            max_peaks=max_cluster,
                                            cc_iters=cc_iters)
        # NMS-slot saturation vs the reference's unbounded top_k (cluster
        # slots not counted — see ops/instance_postproc.py rationale)
        truncated = jnp.maximum(
            count_nms_peaks(ch, refine_thresh, nms_kernel) - max_ctr, 0)
        c_root = roots[c_ys, c_xs]
        c_valid = c_valid & (ch[c_ys, c_xs] > 0.05) & (c_root != HW) & comp_ok[c_root]
        # merge rule: accept a cluster center only if >100px from every NMS
        # center of the same component (or the component has none)
        d2 = (jnp.square(c_ys[:, None] - n_ys[None, :]).astype(jnp.float32) +
              jnp.square(c_xs[:, None] - n_xs[None, :]))
        same = n_valid[None, :] & (c_root[:, None] == n_root[None, :])
        min_d = jnp.min(jnp.where(same, jnp.sqrt(d2), jnp.inf), axis=1)
        c_valid = c_valid & (min_d > 100.0)

        ctr_y = jnp.concatenate([n_ys, c_ys])
        ctr_x = jnp.concatenate([n_xs, c_xs])
        ctr_valid = jnp.concatenate([n_valid, c_valid])
        ctr_root = jnp.concatenate([n_root, c_root])
        is_cluster = jnp.concatenate([jnp.zeros_like(n_valid), c_valid])

        # drop whole components with too many centers (reference skips the
        # contour when n_ins > MAXIMUM_NUM_INST)
        per_root = jax.ops.segment_sum(ctr_valid.astype(jnp.int32),
                                       jnp.where(ctr_valid, ctr_root, HW),
                                       num_segments=HW + 1)
        ctr_valid = ctr_valid & (per_root[ctr_root] <= MAXIMUM_NUM_INST)

        # one assignment pass for this class
        assign = assign_pixels(ctr_y, ctr_x, ctr_valid, ctr_root,
                               offset_map, roots)  # (H,W) in [0..S]
        assign_flat = assign.reshape(-1)

        # per-slot stats over assigned pixels
        # the reference marks cluster centers as 1.0 spikes in the heatmap
        # before reading the per-instance max (modules/utils.py:578-590)
        ch_spiked = ch.at[c_ys, c_xs].set(
            jnp.where(c_valid, 1.0, ch[c_ys, c_xs]))
        val = ch_spiked.reshape(-1)
        npix = jax.ops.segment_sum(jnp.ones((HW,)), assign_flat,
                                   num_segments=S + 1)
        prob = seg_probs[..., cls_idx + 1].reshape(-1)
        psum = jax.ops.segment_sum(prob, assign_flat, num_segments=S + 1)
        seg_score = psum / jnp.maximum(npix, 1.0)
        vmax = jax.ops.segment_max(
            jnp.where(assign_flat < S, val, -jnp.inf), assign_flat,
            num_segments=S + 1)
        # argmax pixel (first max, ties by smallest flat index like torch)
        at_max = val >= vmax[assign_flat] - 1e-12
        pmax = -jax.ops.segment_max(
            jnp.where(at_max, -flat_idx, -HW * 2), assign_flat,
            num_segments=S + 1)
        py = (pmax // W).astype(jnp.float32)
        px = (pmax % W).astype(jnp.float32)

        center_score = vmax[:S]
        seg_score = seg_score[:S]
        has_pix = npix[:S] > 0
        slot_ok = ctr_valid & has_pix

        use_seg_center = center_score < refine_thresh
        out_y = jnp.where(use_seg_center,
                          jnp.floor(comp_cy[ctr_root]), py[:S])
        out_x = jnp.where(use_seg_center,
                          jnp.floor(comp_cx[ctr_root]), px[:S])
        conf = jnp.where(use_seg_center, seg_score, center_score * seg_score)
        conf = jnp.clip(conf, 0.0, 1.0)

        # pixel maps: weight = conf of own slot, offsets toward slot center
        slot_conf = jnp.concatenate([jnp.where(slot_ok, conf, 0.0), jnp.zeros((1,))])
        slot_y = jnp.concatenate([out_y, jnp.zeros((1,))])
        slot_x = jnp.concatenate([out_x, jnp.zeros((1,))])
        slot_live = jnp.concatenate([slot_ok, jnp.zeros((1,), bool)])
        w_px = slot_conf[assign] * slot_live[assign]
        live_px = slot_live[assign]
        off_y = (slot_y[assign] - ys) * live_px
        off_x = (slot_x[assign] - xs) * live_px
        return (off_y, off_x, w_px, out_y, out_x, slot_ok & active, is_cluster,
                truncated)

    (off_y, off_x, w_px, sel_y, sel_x, sel_ok, _, trunc) = jax.lax.map(
        per_class, jnp.arange(first_class, num_classes))

    offset = jnp.stack([jnp.sum(off_y, 0), jnp.sum(off_x, 0)], axis=-1)
    weight = jnp.sum(w_px, 0)[..., None]
    cls_ids = jnp.repeat(jnp.arange(first_class, num_classes), S)
    center = stamp_centers(sel_ok.reshape(-1), sel_y.reshape(-1),
                           sel_x.reshape(-1), cls_ids, num_classes, sigma,
                           (H, W))
    return {"center": center, "offset": offset, "weight": weight,
            "truncated": jnp.sum(trunc)}
