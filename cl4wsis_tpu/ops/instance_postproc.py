"""Validation-time instance extraction (get_ins_map), device-side.

Re-design of reference ``dataset/utils.py:794-900`` (the version train.py
imports, ``train.py:24``): softmax(+flip TTA) seg argmax -> per-class
connected components (area >= 20) -> Panoptic-DeepLab grouping with
offset-cluster extension -> per-instance (label, mask, score) where
score = center_score * seg_score and cluster-spiked centers (>= 1) fall
back to seg_score.

Instead of materializing per-instance boolean masks, the device op returns
one (H, W) slot-id map plus per-slot (label, score, valid) arrays; the AP
matcher computes mask IoU directly from the id map (metrics/voc_ap.py),
which is both smaller and faster than the reference's list of full masks.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp

from cl4wsis_tpu.ops.cc import component_stats, connected_components
from cl4wsis_tpu.ops.grouping import (assign_pixels, cluster_peaks,
                                      count_nms_peaks, find_instance_centers)
from cl4wsis_tpu.ops.pseudo_labels import MINIMUM_MASK_SIZE


@partial(jax.jit, static_argnames=(
    "num_classes", "val_thresh", "val_kernel", "beta", "max_ctr",
    "max_cluster", "cc_iters"))
def get_ins_map(seg_prob: jnp.ndarray, center_map: jnp.ndarray,
                offset_map: jnp.ndarray, *, num_classes: int,
                val_thresh: float = 0.1, val_kernel: int = 41,
                beta: float = 3.0, max_ctr: int = 16, max_cluster: int = 8,
                cc_iters: int = 64) -> Dict[str, jnp.ndarray]:
    """One sample (eval batch size is 1 in the reference protocol).

    Args:
      seg_prob: (H, W, C+1) softmax seg probabilities (TTA-fused, resized to
        the original image size; offsets already rescaled by the caller).
      center_map: (H, W, C) center heatmap.
      offset_map: (H, W, 2) offsets (y, x).

    Returns dict:
      ins_map: (H, W) int32, global slot id per pixel or -1.
      label: (C*S,) int32 class index (0-based thing class).
      score: (C*S,) float32 center*seg scores.
      valid: (C*S,) bool.
    """
    H, W = seg_prob.shape[:2]
    HW = H * W
    S = max_ctr + max_cluster
    seg_map = jnp.argmax(seg_prob, axis=-1).astype(jnp.int32)

    def per_class(cls_idx):
        fg = seg_map == cls_idx + 1
        roots = connected_components(fg, connectivity=8, num_iters=cc_iters)
        area, _, _ = component_stats(roots)
        comp_ok = area >= MINIMUM_MASK_SIZE

        ch = center_map[..., cls_idx] * fg

        n_ys, n_xs, n_valid = find_instance_centers(
            ch, threshold=val_thresh, nms_kernel=val_kernel, max_ctr=max_ctr)
        n_root = roots[n_ys, n_xs]
        n_valid = n_valid & (n_root != HW) & comp_ok[n_root]

        c_ys, c_xs, c_valid = cluster_peaks(offset_map, fg, beta=beta,
                                            max_peaks=max_cluster,
                                            cc_iters=cc_iters)
        # NMS centers beyond the slot cap are silently dropped relative to
        # the reference's top_k=10000 (train.py:497); count them so callers
        # can surface saturation instead of hiding it. Cluster slots are NOT
        # counted: cluster candidates within 100px of an NMS center are
        # rejected by the merge rule below on both sides, so overflow there
        # is almost never a real loss (PARITY.md "slot caps").
        truncated = jnp.maximum(
            count_nms_peaks(ch, val_thresh, val_kernel) - max_ctr, 0)
        c_root = roots[c_ys, c_xs]
        c_valid = c_valid & (ch[c_ys, c_xs] > 0.05) & (c_root != HW) & comp_ok[c_root]
        d2 = (jnp.square(c_ys[:, None] - n_ys[None, :]).astype(jnp.float32) +
              jnp.square(c_xs[:, None] - n_xs[None, :]))
        same = n_valid[None, :] & (c_root[:, None] == n_root[None, :])
        min_d = jnp.min(jnp.where(same, jnp.sqrt(d2), jnp.inf), axis=1)
        c_valid = c_valid & (min_d > 100.0)

        ctr_y = jnp.concatenate([n_ys, c_ys])
        ctr_x = jnp.concatenate([n_xs, c_xs])
        ctr_valid = jnp.concatenate([n_valid, c_valid])
        ctr_root = jnp.concatenate([n_root, c_root])

        assign = assign_pixels(ctr_y, ctr_x, ctr_valid, ctr_root,
                               offset_map, roots)
        assign_flat = assign.reshape(-1)

        ch_spiked = ch.at[c_ys, c_xs].set(jnp.where(c_valid, 1.0, ch[c_ys, c_xs]))
        val = ch_spiked.reshape(-1)
        npix = jax.ops.segment_sum(jnp.ones((HW,)), assign_flat, num_segments=S + 1)
        prob = seg_prob[..., cls_idx + 1].reshape(-1)
        psum = jax.ops.segment_sum(prob, assign_flat, num_segments=S + 1)
        seg_score = (psum / jnp.maximum(npix, 1.0))[:S]
        center_score = jax.ops.segment_max(
            jnp.where(assign_flat < S, val, -jnp.inf), assign_flat,
            num_segments=S + 1)[:S]
        slot_ok = ctr_valid & (npix[:S] > 0)
        center_score = jnp.where(slot_ok, center_score, 0.0)  # -inf on empty
        # cluster-spiked centers read as 1.0 -> fall back to seg_score
        # (dataset/utils.py:885-887)
        center_score = jnp.where(center_score >= 1.0, seg_score, center_score)
        score = center_score * seg_score
        return assign, score, slot_ok, truncated

    assign_all, score_all, ok_all, trunc_all = jax.lax.map(
        per_class, jnp.arange(num_classes))

    # flatten per-class slot ids into global ids; class fg maps are disjoint
    # so at most one class assigns any pixel
    cls_off = (jnp.arange(num_classes) * S)[:, None, None]
    gid = jnp.where(assign_all < S, assign_all + cls_off, -1)  # (C,H,W)
    ins_map = jnp.max(gid, axis=0).astype(jnp.int32)

    label = jnp.repeat(jnp.arange(num_classes, dtype=jnp.int32), S)
    return {"ins_map": ins_map, "label": label,
            "score": score_all.reshape(-1), "valid": ok_all.reshape(-1),
            "truncated": jnp.sum(trunc_all)}
