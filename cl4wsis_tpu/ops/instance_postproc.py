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

Like ops/refine.py, NOTHING here loops over classes: two multi-label
fixpoint passes label every class's components at once, NMS is one pooled
pass over all C channels, and all classes' center slots share one global
slot array — a single root-gated assignment IS the instance id map.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp

from cl4wsis_tpu.ops.cc import connected_components_multilabel
from cl4wsis_tpu.ops.grouping import assign_pixels, assign_pixels_classbanks
from cl4wsis_tpu.ops.refine import (_global_center_slots, _slot_stats,
                                    _slot_stats_sorted)


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
      truncated: () int32 — NMS candidates dropped by the slot cap.
    """
    H, W = seg_prob.shape[:2]
    C = num_classes
    n_slots = C * (max_ctr + max_cluster)
    seg_map = jnp.argmax(seg_prob, axis=-1).astype(jnp.int32)

    roots = connected_components_multilabel(seg_map, connectivity=8,
                                            num_iters=cc_iters)
    # NB: no MAXIMUM_NUM_INST cap at eval (the reference's get_ins_map has
    # none, dataset/utils.py:836-880 — the cap is a refine-only rule).
    # Component size gates are per-slot component_stats queries inside
    # _global_center_slots — the full-HW sort + segmented scan + back-sort
    # this used to run for a per-pixel ok plane is gone.
    slots, ch_spiked, truncated = _global_center_slots(
        seg_map, roots, center_map, offset_map, val_thresh,
        val_kernel, beta, max_ctr, max_cluster, cc_iters, C,
        max_inst_cap=False)

    # class-banked assignment: each pixel competes only inside its own
    # class's (max_ctr+max_cluster)-slot bank — exact (root purity, see
    # assign_pixels_classbanks) and C x narrower than the full-S lane
    # reduce, which scales with the wide eval slot axis.
    if os.environ.get("CL4WSIS_BANKED_ASSIGN", "1") == "0":
        assign = assign_pixels(slots["ys"], slots["xs"], slots["valid"],
                               slots["root"], offset_map, roots)
    else:
        assign = assign_pixels_classbanks(
            slots["ys"], slots["xs"], slots["valid"], slots["root"],
            offset_map, roots, jnp.clip(seg_map - 1, 0),
            num_classes=C, max_ctr=max_ctr, max_cluster=max_cluster)
    # sorted-domain stats: the slot axis is wide here (C*(32+8) = 800 at
    # val vs 121 in training refine) and the (HW, S) lane reduce was ~44%
    # of the whole eval forward (docs/verification.md round-5 entry). The
    # lane path stays as the off-switch + test oracle.
    stats_fn = (_slot_stats
                if os.environ.get("CL4WSIS_SORTED_SLOT_STATS", "1") == "0"
                else _slot_stats_sorted)
    npix, seg_score, vmax, _, _ = stats_fn(
        slots, assign, seg_map, ch_spiked, seg_prob[..., 1:], n_slots)

    center_score = vmax[:n_slots]
    seg_score = seg_score[:n_slots]
    slot_ok = slots["valid"] & (npix[:n_slots] > 0)
    center_score = jnp.where(slot_ok, center_score, 0.0)  # -inf on empty
    # cluster-spiked centers read as 1.0 -> fall back to seg_score
    # (dataset/utils.py:885-887)
    center_score = jnp.where(center_score >= 1.0, seg_score, center_score)
    score = center_score * seg_score

    ins_map = jnp.where(assign < n_slots, assign, -1).astype(jnp.int32)
    return {"ins_map": ins_map, "label": slots["cls"].astype(jnp.int32),
            "score": score, "valid": slot_ok, "truncated": truncated}
