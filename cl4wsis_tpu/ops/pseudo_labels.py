"""Phase-2 pseudo-label generation, fully on device.

Re-design of reference ``modules/utils.py:179-253`` (pseudo_label_generation):
for each *new* class present in the image-level label, connected components
of the frozen-seg argmax mask are matched against CAM peaks; a component is
accepted iff it contains EXACTLY ONE peak of that class and its area is at
least MINIMUM_MASK_SIZE. Accepted components stamp a gaussian center at
their (integer) centroid, offsets-to-centroid, and weight 1.

The reference runs this as a per-image per-class Python loop over
cv2.connectedComponentsWithStats (the phase-2 bottleneck, SURVEY.md §3.4);
here it is one static-shape XLA program: per-class CC via label propagation,
peak counting and per-component stats via segment sums keyed by component
roots, and gaussian stamping via a fixed-slot scan.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from cl4wsis_tpu.ops.cc import (component_stats, connected_components,
                                select_components)
from cl4wsis_tpu.ops.labelgen import stamp_centers

MINIMUM_MASK_SIZE = 20  # modules/utils.py:14
MAXIMUM_NUM_INST = 5    # modules/utils.py:15


@partial(jax.jit, static_argnames=("num_classes", "sigma", "max_comp",
                                   "cc_iters", "first_class"))
def pseudo_label_generation(seg_map: jnp.ndarray,
                            peak_ys: jnp.ndarray, peak_xs: jnp.ndarray,
                            peak_valid: jnp.ndarray,
                            cls_label: jnp.ndarray,
                            num_classes: int, sigma: int = 6,
                            max_comp: int = 32, cc_iters: int = 64,
                            first_class: int = 0
                            ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One sample.

    Args:
      seg_map: (H, W) int32 argmax seg with old classes zeroed (0 = bg).
      peak_ys/peak_xs: (C, K) int32 CAM peak coordinates per thing class.
      peak_valid: (C, K) bool — peak confidence >= pseudo_thresh.
      cls_label: (C,) float/bool — image-level labels for NEW thing classes
        (old entries zeroed by the caller, ``train.py:448-449``).
      num_classes: number of thing classes C (= tot_classes - 1).
      first_class: skip classes below this index entirely (phase 2 only
        generates labels for NEW classes — old entries of cls_label are 0,
        so skipping them is exact and saves their CC/matching work).

    Returns:
      center (H, W, C), offset (H, W, 2), weight (H, W, 1), total_match (),
      truncated () — accepted components beyond the per-class `max_comp`
      stamping slots (offset/weight maps are exact regardless; only the
      gaussian stamp is slot-capped — reference is unbounded).
    """
    H, W = seg_map.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)

    def per_class(cls_idx):
        active = cls_label[cls_idx] > 0
        mask = (seg_map == cls_idx + 1) & active
        roots = connected_components(mask, connectivity=8, num_iters=cc_iters)
        area, cy, cx = component_stats(roots)

        # count this class's valid peaks inside each component
        py, px = peak_ys[cls_idx], peak_xs[cls_idx]
        peak_roots = roots[py, px]  # (K,) root under each peak (HW if bg)
        ok = peak_valid[cls_idx]
        counts = jax.ops.segment_sum(ok.astype(jnp.int32), peak_roots,
                                     num_segments=H * W + 1)

        accept = (counts == 1) & (area >= MINIMUM_MASK_SIZE)
        accept = accept.at[H * W].set(False)

        # per-pixel component properties
        acc_px = accept[roots]
        icy = jnp.floor(cy[roots])   # int centroid, reference uses int(centroid)
        icx = jnp.floor(cx[roots])
        off_y = (icy - ys) * acc_px
        off_x = (icx - xs) * acc_px
        weight = acc_px.astype(jnp.float32)

        # up to max_comp accepted components for gaussian stamping
        sel = select_components(accept, max_comp)
        valid = accept[sel]
        n_match = jnp.sum(accept.astype(jnp.int32))
        return (off_y, off_x, weight, cy[sel], cx[sel], valid, n_match)

    (off_y, off_x, weight, sel_cy, sel_cx, sel_valid, n_match) = jax.lax.map(
        per_class, jnp.arange(first_class, num_classes))
    truncated = jnp.sum(jnp.maximum(n_match - max_comp, 0))

    # merge per-class pixel maps (class fg masks are disjoint)
    offset = jnp.stack([jnp.sum(off_y, 0), jnp.sum(off_x, 0)], axis=-1)
    weight_map = jnp.sum(weight, 0)[..., None]

    cls_ids = jnp.repeat(jnp.arange(first_class, num_classes), max_comp)
    center = stamp_centers(sel_valid.reshape(-1), sel_cy.reshape(-1),
                           sel_cx.reshape(-1), cls_ids, num_classes, sigma,
                           (H, W))
    return center, offset, weight_map, jnp.sum(n_match), truncated
