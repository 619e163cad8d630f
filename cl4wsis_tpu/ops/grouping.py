"""Device-side instance grouping: center NMS, offset-cluster peaks, and
nearest-center pixel assignment.

Re-design of reference ``modules/utils.py:463-632`` (find_instance_center /
group_pixels / cluster_peaks / get_instance_segmentation — Panoptic-DeepLab
post-processing plus the BESTIE offset-cluster extension). The reference
runs these per component inside Python loops with cv2 and batch=1 guards;
here they are static-shape slot arrays:

* centers are (S,) slots with validity flags and a `root` (the connected
  component that owns them), so ONE pixel-assignment pass replaces the
  reference's per-component calls: a pixel may only be assigned to centers
  of its own component;
* assignment scans over center-slot chunks keeping a running (min-dist,
  argmin) — O(HW) memory instead of a K x HW distance matrix.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from cl4wsis_tpu.ops.cc import (component_stats, connected_components,
                                select_components)
from cl4wsis_tpu.ops.peaks import max_pool_same


def find_instance_centers(ctr_hmp: jnp.ndarray, threshold: float = 0.1,
                          nms_kernel: int = 3, max_ctr: int = 16
                          ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """NMS peak detection on one heatmap (H, W) -> top `max_ctr` slots.

    Matches reference find_instance_center (``modules/utils.py:463-502``):
    values <= threshold -> -1, non-maxima -> -1, keep > 0.
    Returns (ys, xs, valid) each (max_ctr,).
    """
    H, W = ctr_hmp.shape
    x = jnp.where(ctr_hmp > threshold, ctr_hmp, -1.0)
    hmax = max_pool_same(x[None, ..., None], nms_kernel)[0, ..., 0]
    x = jnp.where(x == hmax, x, -1.0)
    flat = x.reshape(-1)
    vals, idx = jax.lax.top_k(flat, max_ctr)
    return (idx // W).astype(jnp.int32), (idx % W).astype(jnp.int32), vals > 0


def count_nms_peaks(ctr_hmp: jnp.ndarray, threshold: float,
                    nms_kernel: int) -> jnp.ndarray:
    """Number of NMS-surviving peaks — the unbounded count the reference's
    top_k=10000 would keep (modules/utils.py:463-502). Callers compare this
    against their `max_ctr` slot cap to detect silent truncation. Shares its
    subexpressions with find_instance_centers, so under jit it is free."""
    x = jnp.where(ctr_hmp > threshold, ctr_hmp, -1.0)
    hmax = max_pool_same(x[None, ..., None], nms_kernel)[0, ..., 0]
    return jnp.sum(((x == hmax) & (x > 0)).astype(jnp.int32))


def cluster_peaks(offsets: jnp.ndarray, fg: jnp.ndarray, thresh: float = 2.5,
                  beta: int = 5, max_peaks: int = 8, cc_iters: int = 64,
                  with_count: bool = False):
    """Offset-magnitude cluster centers (``modules/utils.py:608-632``):
    4-connected components of {|offset| < thresh} ∩ fg whose area lies in
    (21-beta, 21+beta); returns integer centroids (ys, xs, valid)
    [+ total accepted-candidate count when ``with_count`` — for truncation
    accounting against the ``max_peaks`` slot cap]."""
    H, W = offsets.shape[:2]
    mag = jnp.sqrt(jnp.square(offsets[..., 0]) + jnp.square(offsets[..., 1]))
    weak = (mag < thresh) & (fg > 0)
    roots = connected_components(weak, connectivity=4, num_iters=cc_iters)
    area, cy, cx = component_stats(roots)
    accept = (area > 21 - beta) & (area < 21 + beta)
    accept = accept.at[H * W].set(False)
    sel = select_components(accept, max_peaks)
    valid = accept[sel]
    out = (jnp.floor(cy[sel]).astype(jnp.int32),
           jnp.floor(cx[sel]).astype(jnp.int32), valid)
    if with_count:
        return out + (jnp.sum(accept.astype(jnp.int32)),)
    return out


@jax.jit
def assign_pixels_lanes(ctr_y: jnp.ndarray, ctr_x: jnp.ndarray,
                        ctr_valid: jnp.ndarray, ctr_root: jnp.ndarray,
                        offsets: jnp.ndarray, pixel_root: jnp.ndarray
                        ) -> jnp.ndarray:
    """assign_pixels as ONE fused lane reduce over the full (S,) slot axis.

    Same result as assign_pixels / assign_pixels_roottable (nearest valid
    center sharing the pixel's root; ties -> lowest slot index). The
    roottable variant gathers each pixel's 8-entry candidate row from a
    per-root table — a ~93 ms/step per-pixel gather fusion on the round-3
    trace. Here every pixel evaluates all S slots as a lane axis: at
    S=120, that is ~5 G fused VPU ops at 512^2 bs16 and zero
    gathers/scatters. (The round-2 chunked scan this superficially
    resembles was slow because of its per-chunk argmin+take_along_axis
    GATHERS, not the distance math.)

    The winner is argmin + min as two plain lane REDUCES: XLA recomputes
    the broadcast distance expression inside each reduce and materializes
    nothing of shape (HW, S). (History: an ismin -> cumsum==1 -> sum
    first-hit select forced a pred[16,262144,120] intermediate into HBM —
    ~49 ms/step, the biggest op of the whole round-3 trace. jnp.argmin's
    first-occurrence tie-break equals the cumsum select.)
    """
    S = ctr_y.shape[0]
    H, W = pixel_root.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    loc_y = (ys + offsets[..., 0]).reshape(-1)
    loc_x = (xs + offsets[..., 1]).reshape(-1)
    proot = pixel_root.reshape(-1)
    d = (jnp.square(loc_y[:, None] - ctr_y[None, :].astype(jnp.float32)) +
         jnp.square(loc_x[:, None] - ctr_x[None, :].astype(jnp.float32)))
    ok = ctr_valid[None, :] & (proot[:, None] == ctr_root[None, :])
    d = jnp.where(ok, d, jnp.inf)
    best = jnp.argmin(d, axis=1).astype(jnp.int32)
    has = jnp.isfinite(jnp.min(d, axis=1))
    return jnp.where(has, best, S).reshape(H, W)


@partial(jax.jit, static_argnames=("k_per_root",))
def assign_pixels_roottable(ctr_y: jnp.ndarray, ctr_x: jnp.ndarray,
                            ctr_valid: jnp.ndarray, ctr_root: jnp.ndarray,
                            offsets: jnp.ndarray, pixel_root: jnp.ndarray,
                            k_per_root: int = 8) -> jnp.ndarray:
    """assign_pixels via a per-ROOT slot table: each pixel competes only
    among its own component's centers, gathered from a (HW+2, K) table —
    K distance evaluations per pixel instead of a scan over all S slots.

    EXACT equivalence to assign_pixels requires every root to hold at most
    `k_per_root` valid centers — guaranteed when the MAXIMUM_NUM_INST cap
    ran (<= 5 valid centers per component, ops/refine.py). This is the
    phase-2 train hot path; the round-2 device trace showed the chunked
    slot scan costing ~60% of the whole step.
    """
    S = ctr_y.shape[0]
    H, W = pixel_root.shape
    HW = H * W
    idx = jnp.arange(S)
    # rank of each valid slot within its root (ties by slot order, matching
    # the scan's argmin tie-break only when ranks are complete — K covers
    # all valid slots of a root, so every candidate is present)
    same = (ctr_valid[None, :] & ctr_valid[:, None] &
            (ctr_root[:, None] == ctr_root[None, :]))
    rank = jnp.sum(same & (idx[None, :] < idx[:, None]), axis=1)
    ok = ctr_valid & (rank < k_per_root)
    # one PACKED table entry per candidate: slot_id * HW + (y*W + x).
    # One int32 gather then fetches id+coords together — per-pixel row
    # gathers are the dominant cost of this op on TPU, so fetch once.
    packed_none = jnp.int32(S) * HW
    entry = (idx * HW + ctr_y * W + ctr_x).astype(jnp.int32)
    pos = jnp.where(ok, ctr_root * k_per_root + rank,
                    (HW + 1) * k_per_root)
    table = jnp.full(((HW + 2) * k_per_root,), packed_none, jnp.int32)
    table = table.at[pos].set(jnp.where(ok, entry, packed_none))
    # per-pixel: gather own root's K candidates, pick nearest
    rows = table.reshape(HW + 2, k_per_root)[pixel_root.reshape(-1)]
    slot = rows // HW
    yx = rows - slot * HW
    cy = (yx // W).astype(jnp.float32)
    cx = (yx % W).astype(jnp.float32)
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    loc_y = (ys + offsets[..., 0]).reshape(-1)
    loc_x = (xs + offsets[..., 1]).reshape(-1)
    d = (jnp.square(loc_y[:, None] - cy) + jnp.square(loc_x[:, None] - cx))
    d = jnp.where(slot < S, d, jnp.inf)
    # first-min one-hot select instead of argmin + take_along_axis: the two
    # per-pixel take_along gathers profiled ~90 ms/step each at 512^2 bs16;
    # a masked sum over the K lane values is fused elementwise work. Tie
    # break = lowest column index, same as argmin.
    dmin = jnp.min(d, axis=1)
    ismin = d == dmin[:, None]
    first = ismin & (jnp.cumsum(ismin.astype(jnp.int32), axis=1) == 1)
    best = jnp.sum(jnp.where(first, slot, 0), axis=1)
    has = jnp.isfinite(dmin)
    return jnp.where(has, best, S).astype(jnp.int32).reshape(H, W)


@partial(jax.jit, static_argnames=("num_classes", "max_ctr", "max_cluster"))
def assign_pixels_classbanks(ctr_y: jnp.ndarray, ctr_x: jnp.ndarray,
                             ctr_valid: jnp.ndarray, ctr_root: jnp.ndarray,
                             offsets: jnp.ndarray, pixel_root: jnp.ndarray,
                             px_cls: jnp.ndarray, *, num_classes: int,
                             max_ctr: int, max_cluster: int) -> jnp.ndarray:
    """assign_pixels over each pixel's OWN class bank only — (HW, K) lanes
    instead of (HW, S=C*K).

    Exact equivalence to the full lane reduce rests on root purity: a VALID
    slot's root always belongs to a component of the slot's own class (NMS
    peaks live inside the class fg mask; cluster slots are gated by
    ``ch_at > 0.05``, i.e. their centroid lies inside the class fg —
    ops/refine.py:163), and a pixel's root is its own class's component, so
    cross-class (pixel, slot) pairs are root-rejected by construction. The
    per-pixel bank rows are fetched with one-hot MATMULS on the MXU at
    HIGHEST precision (inputs stay f32; one nonzero term per row, and every
    value — coords < 4096, roots <= HW+1 — is f32-exact below 2^24), not
    per-pixel gathers (~3 GB/s on the round-3 trace).

    Expects the `_global_center_slots` layout: slots = [NMS block (C,
    max_ctr) class-major | cluster block (C, max_cluster) class-major].
    `px_cls` is each pixel's 0-based bank index (active-range class).
    Tie-break matches the lane argmin: lowest k in the bank = lowest global
    slot id within the only class that can win.
    """
    C, mc, mcl = num_classes, max_ctr, max_cluster
    S = C * (mc + mcl)
    H, W = pixel_root.shape
    if H * W + 2 > 1 << 24:  # f32-exactness bound on the root compare
        return assign_pixels_lanes(ctr_y, ctr_x, ctr_valid, ctr_root,
                                   offsets, pixel_root)

    def bank(a):
        return jnp.concatenate([a[:C * mc].reshape(C, mc),
                                a[C * mc:].reshape(C, mcl)], axis=1)

    banks = jnp.stack([bank(ctr_y.astype(jnp.float32)),
                       bank(ctr_x.astype(jnp.float32)),
                       bank(ctr_valid.astype(jnp.float32)),
                       bank(ctr_root.astype(jnp.float32))])   # (4, C, K)
    onehot = (px_cls.reshape(-1)[:, None] ==
              jnp.arange(C)[None, :]).astype(jnp.float32)     # (HW, C)
    rows = jnp.einsum("pc,fck->fpk", onehot, banks,
                      precision=jax.lax.Precision.HIGHEST)
    cy, cx, cv, cr = rows

    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    loc_y = (ys + offsets[..., 0]).reshape(-1)
    loc_x = (xs + offsets[..., 1]).reshape(-1)
    proot = pixel_root.reshape(-1).astype(jnp.float32)
    d = jnp.square(loc_y[:, None] - cy) + jnp.square(loc_x[:, None] - cx)
    d = jnp.where((cv > 0.5) & (cr == proot[:, None]), d, jnp.inf)
    k = jnp.argmin(d, axis=1).astype(jnp.int32)
    has = jnp.isfinite(jnp.min(d, axis=1))
    pc = px_cls.reshape(-1).astype(jnp.int32)
    gid = jnp.where(k < mc, pc * mc + k, C * mc + pc * mcl + (k - mc))
    return jnp.where(has, gid, S).reshape(H, W)


def assign_pixels(ctr_y: jnp.ndarray, ctr_x: jnp.ndarray, ctr_valid: jnp.ndarray,
                  ctr_root: jnp.ndarray, offsets: jnp.ndarray,
                  pixel_root: jnp.ndarray) -> jnp.ndarray:
    """Assign each pixel to the nearest valid center sharing its root.

    ctr_*: (S,) slot arrays; offsets (H,W,2) (y,x); pixel_root (H,W).
    Returns (H, W) int32 slot index, or S (no center available / background).

    Dispatches to the argmin lane reduce: the round-3 device A/B
    (scripts/bench_assign_ab.py, eval shapes 512² x 480 slots) measured it
    156x faster than the chunked scan (82.06 -> 0.526 ms/call, exact match),
    which also obsoleted the opt-in Pallas assignment kernel (deleted — the
    pure-XLA reduce already streams at memory speed with zero gathers).
    """
    return assign_pixels_lanes(ctr_y, ctr_x, ctr_valid, ctr_root, offsets,
                               pixel_root)


@partial(jax.jit, static_argnames=("chunk",))
def assign_pixels_scan(ctr_y: jnp.ndarray, ctr_x: jnp.ndarray,
                       ctr_valid: jnp.ndarray, ctr_root: jnp.ndarray,
                       offsets: jnp.ndarray, pixel_root: jnp.ndarray,
                       chunk: int = 16) -> jnp.ndarray:
    """Chunked-scan reference implementation (independent oracle for tests
    and the scripts/bench_assign_ab.py A/B; not dispatched in production)."""
    S = ctr_y.shape[0]
    pad = (-S) % chunk
    if pad:
        ctr_y = jnp.pad(ctr_y, (0, pad))
        ctr_x = jnp.pad(ctr_x, (0, pad))
        ctr_valid = jnp.pad(ctr_valid, (0, pad))
        ctr_root = jnp.pad(ctr_root, (0, pad))
    H, W = pixel_root.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    loc_y = (ys + offsets[..., 0]).reshape(-1)
    loc_x = (xs + offsets[..., 1]).reshape(-1)
    proot = pixel_root.reshape(-1)

    cy = ctr_y.reshape(-1, chunk).astype(jnp.float32)
    cx = ctr_x.reshape(-1, chunk).astype(jnp.float32)
    cv = ctr_valid.reshape(-1, chunk)
    cr = ctr_root.reshape(-1, chunk)
    slot_ids = jnp.arange(S + pad, dtype=jnp.int32).reshape(-1, chunk)

    def step(carry, args):
        best_d, best_i = carry
        cy_c, cx_c, cv_c, cr_c, id_c = args
        d = (jnp.square(loc_y[None] - cy_c[:, None]) +
             jnp.square(loc_x[None] - cx_c[:, None]))
        ok = cv_c[:, None] & (cr_c[:, None] == proot[None])
        d = jnp.where(ok, d, jnp.inf)
        ci = jnp.argmin(d, axis=0)
        cd = jnp.take_along_axis(d, ci[None], axis=0)[0]
        upd = cd < best_d
        return (jnp.where(upd, cd, best_d),
                jnp.where(upd, id_c[ci], best_i)), None

    init = (jnp.full((H * W,), jnp.inf), jnp.full((H * W,), S, jnp.int32))
    (best_d, best_i), _ = jax.lax.scan(step, init, (cy, cx, cv, cr, slot_ids))
    return best_i.reshape(H, W)
