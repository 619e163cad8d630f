"""Pallas kernel for connected-components label propagation.

The XLA fallback (ops/cc.py) runs each propagation round as a chain of
associative scans and neighbor mins with HBM-resident intermediates; at
512^2 this is the biggest VPU consumer in the phase-2 label factory. This
kernel keeps the whole label plane in VMEM (1MB at 512^2 int32) and runs
every iteration in-register:

* 8-neighbor min via pltpu.roll + edge masking;
* segmented row/column cummin (both directions) via Hillis-Steele doubling
  with blocked-prefix flags (log2(W) steps, rolls only — no gathers);
* no pointer jumping (gathers are the one op Mosaic can't do cheaply here);
  instead the kernel iterates to FIXPOINT (change detection) under a hard
  cap, which makes the result exact regardless of component tortuosity.

A vmap over a leading batch axis lowers to a kernel grid over that axis so
only one plane lives in VMEM at a time (a naive vmap would block the whole
batch and blow the 16MB budget).

Exact-equivalence with ops/cc.py and cv2 is tested on hardware. Default ON
on TPU since the round-3 device-time A/B (scripts/bench_cc_ab.py): ~45x
faster than the XLA fallback at bs16 x 512^2, bit-exact on both the blobby
(converged-training) and speckle (random-init) regimes. CL4WSIS_PALLAS_CC=0
disables it.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

# DEFAULT ON (round 3): the isolated device-time A/B (scripts/bench_cc_ab.py,
# real v5e, profiler ground truth) measured 44.6x (blobby 53.2->1.19 ms) and
# 47.8x (speckle 164.1->3.44 ms) vs the XLA fallback at bs16 x 512^2, output
# bit-exact in both regimes. CL4WSIS_PALLAS_CC=0 is the kill switch.
ENABLED = os.environ.get("CL4WSIS_PALLAS_CC", "1") == "1"
_BIG = 2 ** 30  # python int: jnp scalars would be captured consts in pallas


def available() -> bool:
    try:
        return ENABLED and _HAS_PALLAS and jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _row_ids(H, W):
    return jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)


def _col_ids(H, W):
    return jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)


def _shift(x, dy, dx, fill):
    """Value of x at (i+dy, j+dx) with `fill` outside (roll + edge mask).

    pltpu.roll only takes non-negative shifts; a shift of -s along an axis
    of size n is a roll by n - s."""
    H, W = x.shape
    y = x
    if dy:
        y = pltpu.roll(y, (-dy) % H, 0)
        rid = _row_ids(H, W)
        ok = (rid + dy >= 0) & (rid + dy < H)
        y = jnp.where(ok, y, fill)
    if dx:
        y = pltpu.roll(y, (-dx) % W, 1)
        cid = _col_ids(H, W)
        ok = (cid + dx >= 0) & (cid + dx < W)
        y = jnp.where(ok, y, fill)
    return y


def _seg_cummin(lab, bg, axis, reverse):
    """Segmented running min along `axis` (Hillis-Steele doubling)."""
    l = jnp.where(bg, _BIG, lab)
    g = bg
    size = lab.shape[axis]
    s = 1
    while s < size:
        d = s if reverse else -s
        if axis == 0:
            l_s = _shift(l, d, 0, _BIG)
            g_num = _shift(g.astype(jnp.int32), d, 0, 1)
        else:
            l_s = _shift(l, 0, d, _BIG)
            g_num = _shift(g.astype(jnp.int32), 0, d, 1)
        g_s = g_num > 0
        l = jnp.where(g, l, jnp.minimum(l, l_s))
        g = g | g_s
        s *= 2
    return jnp.where(bg, _BIG, jnp.minimum(lab, l))


def _cc_compute(mask, num_iters, H, W):
    bg = jnp.logical_not(mask)
    idx = _row_ids(H, W) * W + _col_ids(H, W)
    lab0 = jnp.where(mask, idx, _BIG)
    # h/v edges are fully propagated by the scans — the neighbor block only
    # carries the diagonals, with edge masks hoisted out of the fixpoint loop
    diags = tuple(((dy, dx),
                   (_shift(mask.astype(jnp.int32), dy, dx, 0) > 0) & mask)
                  for dy, dx in ((-1, -1), (-1, 1), (1, -1), (1, 1)))

    def sweep(lab):
        m = lab
        for (dy, dx), ok in diags:
            m = jnp.minimum(m, jnp.where(ok, _shift(lab, dy, dx, _BIG), _BIG))
        lab = jnp.where(mask, jnp.minimum(lab, m), _BIG)
        lab = _seg_cummin(lab, bg, 1, False)
        lab = _seg_cummin(lab, bg, 1, True)
        lab = _seg_cummin(lab, bg, 0, False)
        lab = _seg_cummin(lab, bg, 0, True)
        return lab

    def cond(state):
        it, _, changed = state
        return jnp.logical_and(changed, it < num_iters)

    def body(state):
        it, lab, _ = state
        new = sweep(lab)
        return it + 1, new, jnp.any(new != lab)

    _, lab, _ = jax.lax.while_loop(cond, body, (0, lab0, True))
    return jnp.where(mask, lab, H * W).astype(jnp.int32)


def _call_single(mask, num_iters):
    H, W = mask.shape

    def kernel(mask_ref, out_ref):
        out_ref[:] = _cc_compute(mask_ref[:] > 0, num_iters, H, W)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(mask.astype(jnp.int32))


def _call_batched(masks, num_iters):
    N, H, W = masks.shape

    def kernel(mask_ref, out_ref):
        out_ref[0] = _cc_compute(mask_ref[0] > 0, num_iters, H, W)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, H, W), jnp.int32),
        grid=(N,),
        in_specs=[pl.BlockSpec((1, H, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(masks.astype(jnp.int32))


@partial(jax.jit, static_argnames=("num_iters",))
def connected_components_pallas(mask: jnp.ndarray, num_iters: int = 256
                                ) -> jnp.ndarray:
    """(H, W) bool/int mask -> (H, W) int32 root map (bg = H*W).

    `num_iters` is only the safety cap; the kernel exits at fixpoint."""

    fn = jax.custom_batching.custom_vmap(
        lambda m: _call_single(m, num_iters))

    @fn.def_vmap
    def _vmap_rule(axis_size, in_batched, m):
        assert in_batched[0]
        return _call_batched(m, num_iters), True

    return fn(mask)


# ---------------------------- multi-label variant ---------------------------
# Same fixpoint kernel, but pixels connect only to EQUAL-class neighbors and
# the segmented scans break runs at class changes — one kernel labels every
# class's components at once (the phase-2 label-factory hot path).

def _seg_cummin_flags(lab, bg, start, axis, reverse):
    """Segmented running min along `axis` with explicit run-start flags."""
    l = jnp.where(bg, _BIG, lab)
    g = start
    size = lab.shape[axis]
    s = 1
    while s < size:
        d = s if reverse else -s
        if axis == 0:
            l_s = _shift(l, d, 0, _BIG)
            g_num = _shift(g.astype(jnp.int32), d, 0, 1)
        else:
            l_s = _shift(l, 0, d, _BIG)
            g_num = _shift(g.astype(jnp.int32), 0, d, 1)
        g_s = g_num > 0
        l = jnp.where(g, l, jnp.minimum(l, l_s))
        g = g | g_s
        s *= 2
    return jnp.where(bg, _BIG, jnp.minimum(lab, l))


def _cc_ml_compute(cls, num_iters, H, W, connectivity):
    bg = cls <= 0
    idx = _row_ids(H, W) * W + _col_ids(H, W)
    lab0 = jnp.where(bg, _BIG, idx)
    # h/v edges are fully propagated by the scans — the neighbor block only
    # carries the diagonals (none at connectivity 4), with same-class edge
    # masks hoisted out of the fixpoint loop (loop constants, not per-sweep
    # recomputation)
    offs = (() if connectivity == 4 else
            ((-1, -1), (-1, 1), (1, -1), (1, 1)))
    diags = tuple(((dy, dx), (~bg) & (_shift(cls, dy, dx, -1) == cls))
                  for dy, dx in offs)
    # run-start flags per scan direction: bg, class change, or border
    start_fx = bg | (cls != _shift(cls, 0, -1, -1))
    start_rx = bg | (cls != _shift(cls, 0, 1, -1))
    start_fy = bg | (cls != _shift(cls, -1, 0, -1))
    start_ry = bg | (cls != _shift(cls, 1, 0, -1))

    def sweep(lab):
        m = lab
        for (dy, dx), ok in diags:
            m = jnp.minimum(m, jnp.where(ok, _shift(lab, dy, dx, _BIG), _BIG))
        lab = jnp.where(bg, _BIG, jnp.minimum(lab, m))
        lab = _seg_cummin_flags(lab, bg, start_fx, 1, False)
        lab = _seg_cummin_flags(lab, bg, start_rx, 1, True)
        lab = _seg_cummin_flags(lab, bg, start_fy, 0, False)
        lab = _seg_cummin_flags(lab, bg, start_ry, 0, True)
        return lab

    def cond(state):
        it, _, changed = state
        return jnp.logical_and(changed, it < num_iters)

    def body(state):
        it, lab, _ = state
        new = sweep(lab)
        return it + 1, new, jnp.any(new != lab)

    _, lab, _ = jax.lax.while_loop(cond, body, (0, lab0, True))
    return jnp.where(bg, H * W, lab).astype(jnp.int32)


def _call_single_ml(cls, num_iters, connectivity):
    H, W = cls.shape

    def kernel(cls_ref, out_ref):
        out_ref[:] = _cc_ml_compute(cls_ref[:], num_iters, H, W, connectivity)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(cls.astype(jnp.int32))


def _call_batched_ml(clss, num_iters, connectivity):
    N, H, W = clss.shape

    def kernel(cls_ref, out_ref):
        out_ref[0] = _cc_ml_compute(cls_ref[0], num_iters, H, W, connectivity)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, H, W), jnp.int32),
        grid=(N,),
        in_specs=[pl.BlockSpec((1, H, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(clss.astype(jnp.int32))


@partial(jax.jit, static_argnames=("connectivity", "num_iters"))
def connected_components_multilabel_pallas(cls_map: jnp.ndarray,
                                           connectivity: int = 8,
                                           num_iters: int = 256
                                           ) -> jnp.ndarray:
    """(H, W) int class map -> (H, W) int32 root map (bg = H*W)."""

    fn = jax.custom_batching.custom_vmap(
        lambda c: _call_single_ml(c, num_iters, connectivity))

    @fn.def_vmap
    def _vmap_rule(axis_size, in_batched, c):
        assert in_batched[0]
        return _call_batched_ml(c, num_iters, connectivity), True

    return fn(cls_map)
