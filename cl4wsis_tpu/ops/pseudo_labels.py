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
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from cl4wsis_tpu.ops import segsort as ss
from cl4wsis_tpu.ops.cc import connected_components_multilabel
from cl4wsis_tpu.ops.labelgen import stamp_centers

MINIMUM_MASK_SIZE = 20  # modules/utils.py:14
MAXIMUM_NUM_INST = 5    # modules/utils.py:15


class Components(NamedTuple):
    """Shared label-factory component pass, in SORTED-DOMAIN form.

    ``jax.ops.segment_*`` over HW-sized root tables lowers to serialized
    XLA scatters (~36 ms each over 4M inputs on the round-3 device trace;
    six of them were the biggest cost block of the whole phase-2 step), and
    reading a table back per pixel is a ~45 ms gather. Sorting the root map
    once (~6 ms) makes every per-component stat a segmented scan, and ONE
    back-sort turns the results into per-pixel PLANES that subsume every
    ``table[roots]`` read: table[roots[y, x]] == plane[y, x].

    Element arrays (``*_e``) are indexed by sorted position; ``skey`` is the
    element's component root (= smallest member flat index; HW for
    background), ``sidx`` its original flat pixel index.
    """
    eff: jnp.ndarray        # (H, W) int32 class map (0 = bg/inactive)
    roots: jnp.ndarray      # (H, W) int32 component root per pixel
    skey: jnp.ndarray       # (HW,) int32 sorted root ids
    sidx: jnp.ndarray       # (HW,) int32 original flat index per element
    starts: jnp.ndarray     # (HW,) bool run starts in sorted order
    area_e: jnp.ndarray     # (HW,) int32 component area per element
    cy_e: jnp.ndarray       # (HW,) f32 component centroid y per element
    cx_e: jnp.ndarray       # (HW,) f32 component centroid x per element
    accept_e: jnp.ndarray   # (HW,) bool 1-peak-1-component acceptance
    packed_px: jnp.ndarray  # (H, W) int32 (accept*2 + ok)*HW + cyi*W + cxi


def class_components(seg_map: jnp.ndarray, cls_label: jnp.ndarray,
                     num_classes: int, first_class: int, cc_iters: int,
                     peak_ys: jnp.ndarray | None = None,
                     peak_xs: jnp.ndarray | None = None,
                     peak_valid: jnp.ndarray | None = None) -> Components:
    """Shared CC pass of the phase-2 label factory: mask the argmax seg to
    active classes in [first_class, num_classes), label every class's
    components in ONE multilabel fixpoint pass, and compute per-component
    stats in ONE sorted-domain pass (see Components).

    Both pseudo_label_generation and refine_label_generation consume the
    SAME (seg, label) input, so the train step computes this once and
    passes it to both — the round-2 profile showed each fixpoint pass is a
    top-3 cost of the whole step, and running it twice was pure waste.

    When CAM peaks are given, the per-component valid-peak count rides the
    same sort (reference acceptance rule modules/utils.py:204-216: exactly
    one peak of the component's class inside it); without peaks, accept_e
    is all-False and only the ok bit (area >= MINIMUM_MASK_SIZE) is live.
    """
    H, W = seg_map.shape
    HW = H * W
    lab_ok = jnp.zeros((num_classes + 1,), bool).at[1:].set(
        (cls_label > 0) & (jnp.arange(num_classes) >= first_class))
    # one-hot class-mask select instead of a (H, W) table gather — per-
    # pixel gathers profiled ~45 ms/step here vs fused compares ~1 ms
    ok_px = jnp.any((seg_map[..., None] == jnp.arange(num_classes + 1))
                    & lab_ok, axis=-1)
    eff = jnp.where(ok_px, seg_map, 0).astype(jnp.int32)
    roots = connected_components_multilabel(eff, connectivity=8,
                                            num_iters=cc_iters)

    # peak indicator plane: a valid peak of class c counts iff it lands on
    # a pixel of class c+1 (components are class-pure, so the per-component
    # sum equals the reference's per-class in-component count). A ~120-
    # element scatter, not an HW-table one.
    if peak_ys is not None:
        py = peak_ys.reshape(-1)
        px = peak_xs.reshape(-1)
        pcls = jnp.repeat(jnp.arange(num_classes), peak_ys.shape[1])
        okp = peak_valid.reshape(-1) & (eff[py, px] == pcls + 1)
        peak_plane = jnp.zeros((HW,), jnp.int32).at[py * W + px].add(
            okp.astype(jnp.int32))
    else:
        peak_plane = jnp.zeros((HW,), jnp.int32)

    idx = jnp.arange(HW, dtype=jnp.int32)
    skey, sidx, speak = ss.sort_by(roots.reshape(-1), idx, peak_plane)
    starts = ss.run_starts(skey)
    y_e = sidx // W
    x_e = sidx % W
    # int32 sums are EXACT here (<= HW * (H-1) < 2^31), unlike the f32
    # accumulation of a segment_sum table. One fused Pallas pass on TPU:
    # each XLA associative_scan level materializes stride-2 slices +
    # interior pads over the full row in HBM (~70 ms/step of the round-4
    # phase-2 trace across this function + the refine weak-CC stats).
    from cl4wsis_tpu.ops.pallas_seg import run_totals1
    area_e, sy_e, sx_e, counts_e = run_totals1(skey, y_e, x_e, speak)
    denom = jnp.maximum(area_e, 1).astype(jnp.float32)
    cy_e = sy_e.astype(jnp.float32) / denom
    cx_e = sx_e.astype(jnp.float32) / denom

    fg_e = skey < HW
    ok_e = fg_e & (area_e >= MINIMUM_MASK_SIZE)
    accept_e = ok_e & (counts_e == 1)
    cyi = jnp.clip(jnp.floor(cy_e), 0, H - 1).astype(jnp.int32)
    cxi = jnp.clip(jnp.floor(cx_e), 0, W - 1).astype(jnp.int32)
    flags = accept_e.astype(jnp.int32) * 2 + ok_e.astype(jnp.int32)
    packed_e = (flags * H + cyi) * W + cxi
    # back-sort by original index = the per-pixel plane (a second ~6 ms
    # sort instead of a ~36 ms scatter or ~45 ms per-pixel table gather)
    _, packed_px = ss.sort_by(sidx, packed_e)
    return Components(eff, roots, skey, sidx, starts, area_e, cy_e, cx_e,
                      accept_e, packed_px.reshape(H, W))


def pseudo_label_slots(seg_map: jnp.ndarray,
                       peak_ys: jnp.ndarray, peak_xs: jnp.ndarray,
                       peak_valid: jnp.ndarray,
                       cls_label: jnp.ndarray,
                       num_classes: int, sigma: int = 6,
                       max_comp: int = 64, cc_iters: int = 64,
                       first_class: int = 0,
                       components=None):
    """Everything of :func:`pseudo_label_generation` EXCEPT the gaussian
    stamp: returns (stamp_slots, offset, weight, n_match, truncated) where
    stamp_slots = (valid, cy, cx, cls) slot arrays of length `max_comp`.

    Callers that batch (the phase-2 train step) stamp all images at once
    with ops/pallas_stamp.stamp_centers_batched — under vmap the per-image
    stamp scan's dynamic window updates cannot batch and lower to
    while-loops over the batch (~65 ms/step on the round-4 trace).
    """
    H, W = seg_map.shape
    HW = H * W
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)

    # zero out pixels of inactive / skipped classes, then label every
    # class's components + stats in ONE sorted-domain pass (or reuse the
    # caller's shared pass — phase2 computes it once with the peaks inline)
    if components is None:
        components = class_components(seg_map, cls_label, num_classes,
                                      first_class, cc_iters,
                                      peak_ys, peak_xs, peak_valid)
    comp: Components = components
    eff = comp.eff

    # per-pixel component properties: acceptance bit + floored centroid
    # arrive pre-packed in one int32 plane (Components.packed_px) — no
    # root-table scatters, no per-pixel table gathers
    pkm = comp.packed_px
    acc_px = pkm >= 2 * HW
    rem = pkm % HW
    off_y = ((rem // W).astype(jnp.float32) - ys) * acc_px
    off_x = ((rem % W).astype(jnp.float32) - xs) * acc_px
    offset = jnp.stack([off_y, off_x], axis=-1)
    weight_map = acc_px.astype(jnp.float32)[..., None]

    # up to max_comp accepted components stamp gaussians, in ascending root
    # order (sorted order IS root order); a root's class is its own pixel's
    # class (roots are class-pure)
    flags_sel = comp.starts & comp.accept_e
    pos = ss.select_flagged(flags_sel, max_comp)
    posc = jnp.minimum(pos, HW - 1)
    valid = (pos < HW) & flags_sel[posc]
    sel_root = comp.skey[posc]
    sel_cls = eff.reshape(-1)[jnp.where(valid, sel_root, 0)] - 1
    sel_cls = jnp.clip(sel_cls, 0, num_classes - 1)
    n_match = jnp.sum(flags_sel.astype(jnp.int32))
    truncated = jnp.maximum(n_match - max_comp, 0)
    slots = (valid, comp.cy_e[posc], comp.cx_e[posc], sel_cls)
    return slots, offset, weight_map, n_match, truncated


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
    (valid, cy, cx, cls), offset, weight_map, n_match, truncated = \
        pseudo_label_slots(seg_map, peak_ys, peak_xs, peak_valid, cls_label,
                           num_classes, sigma, max_comp, cc_iters,
                           first_class, components)
    center = stamp_centers(valid, cy, cx, cls, num_classes, sigma,
                           seg_map.shape)
    return center, offset, weight_map, n_match, truncated
