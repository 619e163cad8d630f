"""Pallas kernel for batched gaussian center stamping.

The XLA path (ops/labelgen.py ``stamp_centers``) scans slots and
read-modify-writes one template window per slot via dynamic slice/update.
Under ``vmap`` a dynamic_update_slice with per-batch indices cannot be
batched, so XLA lowers the scan body to a nested while-loop over the batch:
the round-4 phase-2 device trace showed the stamp loops plus their window
fusions costing ~65 ms/step at bs16 x 512^2 — the single biggest block of
the step — all to place ~1-2k tiny 39^2 windows.

Here the whole composition is ONE kernel over a (B, C) grid: each program
owns one image x class channel, zeroes a padded plane in VMEM, loops the K
slots with a predicated window max-update, and writes the unpadded channel
out. Mosaic only allows 128-aligned dynamic LANE offsets, so the window is
loaded at the slot's 128-aligned lane base and the (zero-padded, 256-lane)
template is rotated into lane position with a dynamic ``pltpu.roll`` —
max-composing against the zero lanes is a no-op, making the rotate exact.
The template itself is computed OUTSIDE by the same XLA device exp as the
oracle, so outputs stay bit-equal to ``stamp_centers`` / the full-plane
scan oracle (tests/test_pallas_kernels.py drives the equivalence on
hardware).

Replaces the host numpy stamping of reference ``center_map_gen``
(``dataset/utils.py:215-252``) on the phase-2 hot path; CL4WSIS_PALLAS_STAMP=0
falls back to the vmapped XLA scan.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

ENABLED = os.environ.get("CL4WSIS_PALLAS_STAMP", "1") == "1"


def available() -> bool:
    try:
        return ENABLED and _HAS_PALLAS and jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(iy_ref, ix_ref, sel_ref, tmpl_ref, out_ref, scratch, *, K, H, W,
            r, win, row0, col0):
    b = pl.program_id(0)
    c = pl.program_id(1)
    scratch[:] = jnp.zeros_like(scratch)

    rows_w = _round_up(win + 8, 8)

    def body(k, carry):
        @pl.when(sel_ref[b, k] == c)
        def _():
            # image pixel (iy, ix) sits at scratch (row0 + iy, col0 + ix);
            # the window's top-left is (row0 + iy - r, col0 + ix - r).
            # Mosaic requires 8-aligned sublane / 128-aligned lane starts:
            # load the window at the aligned bases and rotate the zero-
            # padded template into position (max against zero is a no-op).
            ys = row0 + iy_ref[b, k] - r
            xs = col0 + ix_ref[b, k] - r
            y0 = pl.multiple_of((ys // 8) * 8, 8)
            x0 = pl.multiple_of((xs // 128) * 128, 128)
            dy = ys - y0
            dx = xs - x0
            sub = scratch[pl.ds(y0, rows_w), pl.ds(x0, 256)]
            tsh = pltpu.roll(pltpu.roll(tmpl_ref[:], dy, 0), dx, 1)
            scratch[pl.ds(y0, rows_w), pl.ds(x0, 256)] = jnp.maximum(sub, tsh)
        return carry

    jax.lax.fori_loop(0, K, body, 0)
    out_ref[0, 0] = scratch[row0:row0 + H, col0:col0 + W]


@partial(jax.jit, static_argnames=("num_classes", "sigma", "shape"))
def stamp_centers_batched_pallas(valid: jnp.ndarray, cy: jnp.ndarray,
                                 cx: jnp.ndarray, cls: jnp.ndarray,
                                 num_classes: int, sigma: int,
                                 shape: Tuple[int, int]) -> jnp.ndarray:
    """Batched stamp_centers on TPU: (B, K) slot arrays -> (B, H, W, C).

    Exactly the semantics of ``jax.vmap(stamp_centers)``: max-composed
    device-exp gaussian of radius 3*sigma+1 at integer-floored (cy, cx)
    into the slot's class channel; invalid or off-plane slots stamp
    nothing.
    """
    H, W = shape
    B, K = valid.shape
    r = 3 * sigma + 1
    win = 2 * r + 1
    # the 256-lane cyclic roll places the template at lanes [dx, dx+win),
    # dx up to 127 — any wider window wraps mass ~256 lanes left of the
    # intended position. stamp_centers_batched falls back to XLA beyond it.
    assert win + 127 <= 256, (sigma, "window exceeds the 256-lane rotate pad")
    row0 = _round_up(r, 8)
    col0 = 128  # >= r and a lane-aligned image origin for the output copy
    rows_w = _round_up(win + 8, 8)
    rows = max(((row0 + H - 1 - r) // 8) * 8 + rows_w,
               _round_up(row0 + H, 8))
    lanes = max(((col0 + W - 1 - r) // 128) * 128 + 256,
                _round_up(col0 + W, 128))

    fy = jnp.floor(cy)
    fx = jnp.floor(cx)
    ok = valid & (fy >= 0) & (fy < H) & (fx >= 0) & (fx < W)
    iy = jnp.clip(fy, 0, H - 1).astype(jnp.int32)
    ix = jnp.clip(fx, 0, W - 1).astype(jnp.int32)
    # class selector: matching channel id, or -1 (stamps nothing)
    sel = jnp.where(ok, jnp.clip(cls, 0, num_classes - 1), -1).astype(
        jnp.int32)

    # constant template by the same DEVICE exp as the XLA paths (the dummy
    # data dependency defeats constant folding, whose exp differs by 1 ulp),
    # zero-padded to the (rows_w, 256) rotate pad
    dy = jax.lax.broadcasted_iota(jnp.float32, (win, win), 0) - r
    dx = jax.lax.broadcasted_iota(jnp.float32, (win, win), 1) - r
    zero = jnp.minimum(jnp.float32(0), jnp.sum(iy).astype(jnp.float32) * 0)
    tmpl = jnp.exp(-(dx ** 2 + dy ** 2) / (2.0 * sigma ** 2) + zero)
    tmpl = jnp.pad(tmpl, ((0, rows_w - win), (0, 256 - win)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,          # iy, ix, sel ride SMEM
        grid=(B, num_classes),
        in_specs=[
            pl.BlockSpec((rows_w, 256), lambda b, c, iy, ix, sel: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, H, W),
                               lambda b, c, iy, ix, sel: (b, c, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((rows, lanes), jnp.float32)],
    )
    out = pl.pallas_call(
        partial(_kernel, K=K, H=H, W=W, r=r, win=win, row0=row0, col0=col0),
        out_shape=jax.ShapeDtypeStruct((B, num_classes, H, W), jnp.float32),
        grid_spec=grid_spec,
    )(iy, ix, sel, tmpl)
    return jnp.transpose(out, (0, 2, 3, 1))


def stamp_centers_batched(valid: jnp.ndarray, cy: jnp.ndarray,
                          cx: jnp.ndarray, cls: jnp.ndarray,
                          num_classes: int, sigma: int,
                          shape: Tuple[int, int]) -> jnp.ndarray:
    """Batched gaussian stamping: Pallas on TPU, vmapped XLA scan elsewhere.

    (B, K) slot arrays -> (B, H, W, num_classes), bit-equal between paths.
    Windows wider than the kernel's 256-lane rotate pad (sigma > 21) take
    the XLA path unconditionally.
    """
    if available() and (2 * (3 * sigma + 1) + 1) + 127 <= 256:
        return stamp_centers_batched_pallas(valid, cy, cx, cls,
                                            num_classes, sigma, shape)
    from cl4wsis_tpu.ops.labelgen import stamp_centers
    fn = partial(stamp_centers, num_classes=num_classes, sigma=sigma,
                 shape=shape)
    return jax.vmap(fn)(valid, cy, cx, cls)
