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

from cl4wsis_tpu.ops.cc import connected_components_multilabel
from cl4wsis_tpu.ops.labelgen import stamp_centers

MINIMUM_MASK_SIZE = 20  # modules/utils.py:14
MAXIMUM_NUM_INST = 5    # modules/utils.py:15


class Components(NamedTuple):
    """Shared label-factory component pass, in PEAK-SEEDED form.

    Every component the factory can ACCEPT contains exactly one valid CAM
    peak (modules/utils.py:204-216), so the set of components that matter
    downstream is bounded by the static peak budget S = n_active_classes *
    K — not by the image. Stats therefore live on the (S,) peak axis,
    computed by fused lane compares against the root plane
    (:func:`component_stats`), instead of the earlier sorted-domain design:
    two full HW sorts + segmented scans per image cost ~25 ms/step of the
    round-4 phase-2 device trace (the s32[16, 262144] sort pair plus their
    HBM<->staging copies), all to carry per-pixel stats of components that
    could never be accepted.
    """
    eff: jnp.ndarray       # (H, W) int32 class map (0 = bg/inactive)
    roots: jnp.ndarray     # (H, W) int32 component root per pixel (HW = bg)
    proot: jnp.ndarray     # (S,) int32 component root per peak (HW invalid)
    accept_p: jnp.ndarray  # (S,) bool 1-peak-1-component acceptance
    cy_p: jnp.ndarray      # (S,) f32 component centroid y per peak
    cx_p: jnp.ndarray      # (S,) f32 component centroid x per peak
    pcls: jnp.ndarray      # (S,) int32 0-based global class id per peak


def component_stats(roots: jnp.ndarray, qroots: jnp.ndarray
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Exact (area, sum_y, sum_x) of each query root's component.

    One fused (HW, S) lane compare + reduce over the root plane — the
    promoted round-3 pattern (a ~121-lane fused reduce streams at memory
    speed, while an HW-table ``segment_sum``/gather pair profiled 36+45 ms).
    Sentinel queries (>= HW, the background root) return zeros rather than
    the full background count. int32 sums are EXACT (<= HW*(H-1) < 2^31).
    """
    H, W = roots.shape
    HW = H * W
    flat = roots.reshape(-1)
    idx = jnp.arange(HW, dtype=jnp.int32)
    q = jnp.where(qroots < HW, qroots, -1)      # bg/invalid matches nothing
    hot = flat[:, None] == q[None, :]           # (HW, S) fused lanes
    area = jnp.sum(hot.astype(jnp.int32), axis=0)
    sy = jnp.sum(jnp.where(hot, (idx // W)[:, None], 0), axis=0)
    sx = jnp.sum(jnp.where(hot, (idx % W)[:, None], 0), axis=0)
    return area, sy, sx


def class_components(seg_map: jnp.ndarray, cls_label: jnp.ndarray,
                     num_classes: int, first_class: int, cc_iters: int,
                     peak_ys: jnp.ndarray | None = None,
                     peak_xs: jnp.ndarray | None = None,
                     peak_valid: jnp.ndarray | None = None) -> Components:
    """Shared CC pass of the phase-2 label factory: mask the argmax seg to
    active classes in [first_class, num_classes), label every class's
    components in ONE multilabel fixpoint pass, and compute the stats of
    every peak-seeded component (see Components).

    Both pseudo_label_generation and refine_label_generation consume the
    SAME (seg, label) input, so the train step computes this once and
    passes it to both — the round-2 profile showed each fixpoint pass is a
    top-3 cost of the whole step, and running it twice was pure waste.

    A peak of class c is live iff it lands on a pixel of class c+1
    (components are class-pure, so counting same-root live peaks equals the
    reference's per-class in-component count, modules/utils.py:204-216);
    acceptance = live peak + component area >= MINIMUM_MASK_SIZE + exactly
    one live peak in the component. Without peaks (the standalone
    refinement path), the peak axis is empty.
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

    if peak_ys is None:
        z = jnp.zeros((0,))
        return Components(eff, roots, z.astype(jnp.int32), z.astype(bool),
                          z.astype(jnp.float32), z.astype(jnp.float32),
                          z.astype(jnp.int32))

    # classes below first_class never produce labels (their eff pixels are
    # zeroed) — slice them off so the static peak axis S stays lane-sized
    py = peak_ys[first_class:].reshape(-1)
    px = peak_xs[first_class:].reshape(-1)
    K = peak_ys.shape[1]
    pcls = jnp.repeat(jnp.arange(first_class, num_classes), K)
    okp = peak_valid[first_class:].reshape(-1) & (eff[py, px] == pcls + 1)
    proot = jnp.where(okp, roots[py, px], HW)

    area_p, sy_p, sx_p = component_stats(roots, proot)
    denom = jnp.maximum(area_p, 1).astype(jnp.float32)
    cy_p = sy_p.astype(jnp.float32) / denom
    cx_p = sx_p.astype(jnp.float32) / denom
    # live peaks sharing this peak's component (an S x S compare, not an
    # HW-table scatter); acceptance wants exactly one
    cnt_p = jnp.sum((okp[None, :] & (proot[:, None] == proot[None, :]))
                    .astype(jnp.int32), axis=1)
    accept_p = okp & (area_p >= MINIMUM_MASK_SIZE) & (cnt_p == 1)
    return Components(eff, roots, proot, accept_p, cy_p, cx_p, pcls)


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
    # class's components + peak-seeded stats (or reuse the caller's shared
    # pass — phase2 computes it once with the peaks inline)
    if components is None:
        components = class_components(seg_map, cls_label, num_classes,
                                      first_class, cc_iters,
                                      peak_ys, peak_xs, peak_valid)
    comp: Components = components

    # per-pixel offset/weight maps over ALL accepted components (exact
    # regardless of the stamping cap): each accepted component holds
    # exactly one live peak, so matching the pixel's root against the
    # accepted peaks' roots is one fused (HW, S) lane compare; exactly one
    # lane can be hot, so a masked sum reads out the packed centroid.
    acc_root = jnp.where(comp.accept_p, comp.proot, HW)
    cyi = jnp.clip(jnp.floor(comp.cy_p), 0, H - 1).astype(jnp.int32)
    cxi = jnp.clip(jnp.floor(comp.cx_p), 0, W - 1).astype(jnp.int32)
    packed_p = jnp.where(comp.accept_p, cyi * W + cxi + 1, 0)  # 0 = no hit
    hot = comp.roots.reshape(-1)[:, None] == \
        jnp.where(acc_root < HW, acc_root, -1)[None, :]
    pk_px = jnp.sum(jnp.where(hot, packed_p[None, :], 0),
                    axis=1).reshape(H, W)
    acc_px = pk_px > 0
    rem = jnp.maximum(pk_px - 1, 0)
    off_y = ((rem // W).astype(jnp.float32) - ys) * acc_px
    off_x = ((rem % W).astype(jnp.float32) - xs) * acc_px
    offset = jnp.stack([off_y, off_x], axis=-1)
    weight_map = acc_px.astype(jnp.float32)[..., None]

    # up to max_comp accepted components stamp gaussians, in ascending root
    # order (the order the former sorted-domain selection produced);
    # accepted roots are distinct, so the sort is tie-free. Pad the peak
    # axis so the slot arrays keep their static max_comp length.
    S = acc_root.shape[0]
    cy_p, cx_p, pcls = comp.cy_p, comp.cx_p, comp.pcls
    if S < max_comp:
        pad = max_comp - S
        acc_root = jnp.concatenate(
            [acc_root, jnp.full((pad,), HW, jnp.int32)])
        cy_p = jnp.concatenate([cy_p, jnp.zeros((pad,), cy_p.dtype)])
        cx_p = jnp.concatenate([cx_p, jnp.zeros((pad,), cx_p.dtype)])
        pcls = jnp.concatenate([pcls, jnp.zeros((pad,), pcls.dtype)])
    order = jnp.argsort(acc_root)
    take = order[:max_comp]
    valid = acc_root[take] < HW
    n_match = jnp.sum(comp.accept_p.astype(jnp.int32))
    truncated = jnp.maximum(n_match - max_comp, 0)
    slots = (valid, cy_p[take], cx_p[take],
             jnp.clip(pcls[take], 0, num_classes - 1))
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
