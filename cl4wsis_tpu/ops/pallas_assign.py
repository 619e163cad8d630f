"""Pallas kernel for nearest-center pixel assignment (grouping hot op).

The XLA fallback in ops/grouping.py scans center chunks with an
HBM-resident running (min-dist, argmin) state; this kernel instead keeps a
pixel tile AND the full center-slot table in VMEM and computes the masked
argmin in one pass — one HBM read of the pixel fields, one write of the
assignment, no intermediate round-trips.

Grid: row blocks of the flattened pixel arrays. Slot metadata (y, x, valid,
root) rides as (1, S)-shaped VMEM rows broadcast to every block (S <= a few
dozen in this pipeline). Enabled on TPU via CL4WSIS_PALLAS_ASSIGN=1 (same
opt-in philosophy as pallas_abn: A/B on real hardware).
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

ENABLED = os.environ.get("CL4WSIS_PALLAS_ASSIGN", "0") == "1"
_BLOCK = 1024


def available() -> bool:
    try:
        return ENABLED and _HAS_PALLAS and jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _kernel(loc_y_ref, loc_x_ref, proot_ref, cy_ref, cx_ref, cv_ref,
            cr_ref, out_ref, *, n_slots: int):
    ly = loc_y_ref[:]                    # (bm, 128) layout of flat pixels
    lx = loc_x_ref[:]
    pr = proot_ref[:]
    best_d = jnp.full(ly.shape, jnp.inf, jnp.float32)
    best_i = jnp.full(ly.shape, n_slots, jnp.int32)
    for s in range(n_slots):             # static unroll; S is small
        d = jnp.square(ly - cy_ref[0, s]) + jnp.square(lx - cx_ref[0, s])
        ok = (cv_ref[0, s] > 0) & (pr == cr_ref[0, s])
        d = jnp.where(ok, d, jnp.inf)
        upd = d < best_d
        best_d = jnp.where(upd, d, best_d)
        best_i = jnp.where(upd, s, best_i)
    out_ref[:] = best_i


@partial(jax.jit, static_argnames=())
def assign_pixels_pallas(ctr_y: jnp.ndarray, ctr_x: jnp.ndarray,
                         ctr_valid: jnp.ndarray, ctr_root: jnp.ndarray,
                         offsets: jnp.ndarray, pixel_root: jnp.ndarray
                         ) -> jnp.ndarray:
    """Same contract as ops.grouping.assign_pixels."""
    S = ctr_y.shape[0]
    H, W = pixel_root.shape
    HW = H * W
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    loc_y = (ys + offsets[..., 0].astype(jnp.float32)).reshape(-1)
    loc_x = (xs + offsets[..., 1].astype(jnp.float32)).reshape(-1)
    proot = pixel_root.reshape(-1).astype(jnp.int32)

    # pad the pixel axis to (rows, 128) lanes
    lanes = 128
    rows = -(-HW // lanes)
    bm = min(_BLOCK, -(-rows // 8) * 8)
    rows_p = -(-rows // bm) * bm
    pad = rows_p * lanes - HW

    def shape2(x, fill):
        return jnp.pad(x, (0, pad), constant_values=fill).reshape(rows_p, lanes)

    loc_y2 = shape2(loc_y, 0.0)
    loc_x2 = shape2(loc_x, 0.0)
    proot2 = shape2(proot, HW)  # padded pixels match no center

    # slot table padded to 128 lanes for clean VMEM rows
    sp = 128
    cy = jnp.pad(ctr_y.astype(jnp.float32), (0, sp - S)).reshape(1, sp)
    cx = jnp.pad(ctr_x.astype(jnp.float32), (0, sp - S)).reshape(1, sp)
    cv = jnp.pad(ctr_valid.astype(jnp.int32), (0, sp - S)).reshape(1, sp)
    cr = jnp.pad(ctr_root.astype(jnp.int32), (0, sp - S),
                 constant_values=-1).reshape(1, sp)

    row_spec = pl.BlockSpec((bm, lanes), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    slot_spec = pl.BlockSpec((1, sp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_kernel, n_slots=S),
        out_shape=jax.ShapeDtypeStruct((rows_p, lanes), jnp.int32),
        grid=(rows_p // bm,),
        in_specs=[row_spec, row_spec, row_spec,
                  slot_spec, slot_spec, slot_spec, slot_spec],
        out_specs=row_spec,
    )(loc_y2, loc_x2, proot2, cy, cx, cv, cr)
    return out.reshape(-1)[:HW].reshape(H, W)
