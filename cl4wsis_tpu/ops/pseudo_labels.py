"""Phase-2 pseudo-label generation, fully on device.

Re-design of reference ``modules/utils.py:179-253`` (pseudo_label_generation):
for each *new* class present in the image-level label, connected components
of the frozen-seg argmax mask are matched against CAM peaks; a component is
accepted iff it contains EXACTLY ONE peak of that class and its area is at
least MINIMUM_MASK_SIZE. Accepted components stamp a gaussian center at
their (integer) centroid, offsets-to-centroid, and weight 1.

The reference runs this as a per-image per-class Python loop over
cv2.connectedComponentsWithStats (the phase-2 bottleneck, SURVEY.md §3.4);
here it is one static-shape XLA program. Since class regions of an argmax
map are DISJOINT, all classes are labeled in a single multi-label
fixpoint pass (ops/cc.py connected_components_multilabel) — the round-2
device trace showed per-class CC loops dominating the whole phase-2 step,
so there is exactly ONE label-propagation loop here, and peak matching /
stats / stamping are global segment ops over component roots.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from cl4wsis_tpu.ops.cc import (component_stats,
                                connected_components_multilabel,
                                select_components)
from cl4wsis_tpu.ops.labelgen import stamp_centers

MINIMUM_MASK_SIZE = 20  # modules/utils.py:14
MAXIMUM_NUM_INST = 5    # modules/utils.py:15


def class_components(seg_map: jnp.ndarray, cls_label: jnp.ndarray,
                     num_classes: int, first_class: int, cc_iters: int):
    """Shared CC pass of the phase-2 label factory: mask the argmax seg to
    active classes in [first_class, num_classes), label every class's
    components in ONE multilabel fixpoint pass, and compute per-root stats.

    Both pseudo_label_generation and refine_label_generation consume the
    SAME (seg, label) input, so the train step computes this once and
    passes it to both — the round-2 profile showed each fixpoint pass is a
    top-3 cost of the whole step, and running it twice was pure waste.

    Returns (eff, roots, area, cy, cx).
    """
    lab_ok = jnp.zeros((num_classes + 1,), bool).at[1:].set(
        (cls_label > 0) & (jnp.arange(num_classes) >= first_class))
    # one-hot class-mask select instead of a (H, W) table gather — per-
    # pixel gathers profiled ~45 ms/step here vs fused compares ~1 ms
    ok_px = jnp.any((seg_map[..., None] == jnp.arange(num_classes + 1))
                    & lab_ok, axis=-1)
    eff = jnp.where(ok_px, seg_map, 0).astype(jnp.int32)
    roots = connected_components_multilabel(eff, connectivity=8,
                                            num_iters=cc_iters)
    area, cy, cx = component_stats(roots)
    return eff, roots, area, cy, cx


@partial(jax.jit, static_argnames=("num_classes", "sigma", "max_comp",
                                   "cc_iters", "first_class"))
def pseudo_label_generation(seg_map: jnp.ndarray,
                            peak_ys: jnp.ndarray, peak_xs: jnp.ndarray,
                            peak_valid: jnp.ndarray,
                            cls_label: jnp.ndarray,
                            num_classes: int, sigma: int = 6,
                            max_comp: int = 64, cc_iters: int = 64,
                            first_class: int = 0,
                            components=None
                            ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One sample.

    Args:
      seg_map: (H, W) int32 argmax seg with old classes zeroed (0 = bg).
      peak_ys/peak_xs: (C, K) int32 CAM peak coordinates per thing class.
      peak_valid: (C, K) bool — peak confidence >= pseudo_thresh.
      cls_label: (C,) float/bool — image-level labels for NEW thing classes
        (old entries zeroed by the caller, ``train.py:448-449``).
      num_classes: number of thing classes C (= tot_classes - 1).
      first_class: ignore classes below this index entirely (phase 2 only
        generates labels for NEW classes — old entries of cls_label are 0,
        so ignoring them is exact).
      components: optional precomputed ``class_components(...)`` result —
        the train step shares one CC pass between this and the refinement.

    Returns:
      center (H, W, C), offset (H, W, 2), weight (H, W, 1), total_match (),
      truncated () — accepted components beyond the `max_comp` stamping
      slots PER IMAGE (offset/weight maps are exact regardless; only the
      gaussian stamp is slot-capped — reference is unbounded).
    """
    H, W = seg_map.shape
    HW = H * W
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)

    # zero out pixels of inactive / skipped classes, then label every
    # class's components in ONE pass (or reuse the caller's shared pass)
    if components is None:
        components = class_components(seg_map, cls_label, num_classes,
                                      first_class, cc_iters)
    eff, roots, area, cy, cx = components

    # count valid peaks per component: peak (c, k) counts iff valid AND it
    # lands on a pixel of class c+1 (components are class-pure, so the
    # per-root count equals the reference's per-class in-component count)
    py = peak_ys.reshape(-1)
    px = peak_xs.reshape(-1)
    pcls = jnp.repeat(jnp.arange(num_classes), peak_ys.shape[1])
    ok = peak_valid.reshape(-1) & (eff[py, px] == pcls + 1)
    proots = jnp.where(ok, roots[py, px], HW)
    counts = jax.ops.segment_sum(ok.astype(jnp.int32), proots,
                                 num_segments=HW + 1)

    accept = (counts == 1) & (area >= MINIMUM_MASK_SIZE)
    accept = accept.at[HW].set(False)

    # per-pixel component properties. The reference floors the centroid, so
    # (accept, floor cy, floor cx) pack EXACTLY into one int32 table and the
    # three per-pixel root-keyed gathers (profiled ~44 ms/step each at
    # 512^2 bs16) collapse into one.
    cyi = jnp.clip(jnp.floor(cy), 0, H - 1).astype(jnp.int32)
    cxi = jnp.clip(jnp.floor(cx), 0, W - 1).astype(jnp.int32)
    packed_tab = (accept.astype(jnp.int32) * H + cyi) * W + cxi
    pk = packed_tab[roots]
    acc_px = pk >= HW
    rem = pk - jnp.where(acc_px, HW, 0)
    off_y = ((rem // W).astype(jnp.float32) - ys) * acc_px
    off_x = ((rem % W).astype(jnp.float32) - xs) * acc_px
    offset = jnp.stack([off_y, off_x], axis=-1)
    weight_map = acc_px.astype(jnp.float32)[..., None]

    # up to max_comp accepted components stamp gaussians; a root's class is
    # its own pixel's class (roots are class-pure)
    sel = select_components(accept, max_comp)
    valid = accept[sel]
    sel_cls = eff.reshape(-1)[jnp.where(sel < HW, sel, 0)] - 1
    sel_cls = jnp.clip(sel_cls, 0, num_classes - 1)
    center = stamp_centers(valid, cy[sel], cx[sel], sel_cls, num_classes,
                           sigma, (H, W))
    n_match = jnp.sum(accept.astype(jnp.int32))
    truncated = jnp.maximum(n_match - max_comp, 0)
    return center, offset, weight_map, n_match, truncated
