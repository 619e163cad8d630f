"""Pallas kernel for sorted-domain segment totals.

ops/segsort.py lowers each segmented reduction to a
``jax.lax.associative_scan`` whose XLA decomposition materializes ~18
levels of stride-2 slices + interior pads over the full (B, HW) arrays in
HBM; the round-4 phase-2 device trace shows that slice/pad storm costing
~70 ms/step (the biggest block once stamping moved to Pallas) for what is
arithmetically a handful of passes over 1MB rows.

This kernel computes, for every element of a SORTED key row, the TOTALS of
its equal-key run for four int32 payloads (ones -> run length/area, plus
three caller payloads) entirely in VMEM: one forward segmented-sum
Hillis-Steele doubling pass and one backward fill-from-run-end copy pass,
sharing the flag propagation across payloads — log2(N) register steps
instead of log2(N) HBM round-trips per payload per direction.

Used by the phase-2 label factory's shared component pass
(ops/pseudo_labels.class_components) and the refinement's offset-cluster
stats (ops/refine.py); both keep the XLA segsort path as the off-TPU
fallback and test oracle. CL4WSIS_PALLAS_SEG=0 disables.
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

ENABLED = os.environ.get("CL4WSIS_PALLAS_SEG", "1") == "1"
_LANES = 128


def available() -> bool:
    try:
        return ENABLED and _HAS_PALLAS and jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _col_ids(R, L):
    return jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)


def _row_ids(R, L):
    return jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)


def _roll_down(x, s, fill):
    """Flat row-major shift: out[f] = x[f - s]; out[f < s] = fill."""
    R, L = x.shape
    sl, sr = s % L, s // L
    a = pltpu.roll(x, sl, 1) if sl else x
    c = pltpu.roll(a, sr, 0) if sr else a
    if sl:
        b = pltpu.roll(a, sr + 1, 0)
        y = jnp.where(_col_ids(R, L) < sl, b, c)
    else:
        y = c
    flat = _row_ids(R, L) * L + _col_ids(R, L)
    return jnp.where(flat < s, fill, y)


def _roll_up(x, s, fill):
    """Flat row-major shift: out[f] = x[f + s]; out[f >= N - s] = fill."""
    R, L = x.shape
    N = R * L
    sl, sr = s % L, s // L
    a = pltpu.roll(x, (-sl) % L, 1) if sl else x
    c = pltpu.roll(a, (-sr) % R, 0) if sr else a
    if sl:
        b = pltpu.roll(a, (-(sr + 1)) % R, 0)
        y = jnp.where(_col_ids(R, L) >= L - sl, b, c)
    else:
        y = c
    flat = _row_ids(R, L) * L + _col_ids(R, L)
    return jnp.where(flat >= N - s, fill, y)


def _run_totals_compute(skey, v1, v2, v3, N):
    R, L = skey.shape
    one = jnp.ones_like(skey)
    # run starts/ends from key changes (flat neighbors)
    start = skey != _roll_down(skey, 1, -1)
    end = skey != _roll_up(skey, 1, -1)

    # forward segmented inclusive sums, flags shared across payloads
    g = start
    a0, a1, a2, a3 = one, v1, v2, v3
    s = 1
    while s < N:
        gs = _roll_down(g.astype(jnp.int32), s, 1) > 0
        a0 = jnp.where(g, a0, a0 + _roll_down(a0, s, 0))
        a1 = jnp.where(g, a1, a1 + _roll_down(a1, s, 0))
        a2 = jnp.where(g, a2, a2 + _roll_down(a2, s, 0))
        a3 = jnp.where(g, a3, a3 + _roll_down(a3, s, 0))
        g = g | gs
        s *= 2

    # spread each run's LAST (= total) value back over the run
    h = end
    s = 1
    while s < N:
        hs = _roll_up(h.astype(jnp.int32), s, 1) > 0
        a0 = jnp.where(h, a0, _roll_up(a0, s, 0))
        a1 = jnp.where(h, a1, _roll_up(a1, s, 0))
        a2 = jnp.where(h, a2, _roll_up(a2, s, 0))
        a3 = jnp.where(h, a3, _roll_up(a3, s, 0))
        h = h | hs
        s *= 2
    return a0, a1, a2, a3


@partial(jax.jit, static_argnames=())
def run_totals_pallas(skey: jnp.ndarray, v1: jnp.ndarray, v2: jnp.ndarray,
                      v3: jnp.ndarray
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                                 jnp.ndarray]:
    """Per-element run totals over sorted keys, batched.

    skey/v1/v2/v3: (B, N) int32, N a multiple of 128, skey sorted ascending
    per row. Returns (area, s1, s2, s3): for element i of row b, the run
    length and payload sums over all j with skey[b, j] == skey[b, i].
    """
    B, N = skey.shape
    assert N % _LANES == 0, N
    R = N // _LANES

    def kernel(k_ref, v1_ref, v2_ref, v3_ref, area_ref, s1_ref, s2_ref,
               s3_ref):
        a0, a1, a2, a3 = _run_totals_compute(
            k_ref[0], v1_ref[0], v2_ref[0], v3_ref[0], N)
        area_ref[0], s1_ref[0], s2_ref[0], s3_ref[0] = a0, a1, a2, a3

    spec = pl.BlockSpec((1, R, _LANES), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((B, R, _LANES), jnp.int32)
    rs = lambda x: x.reshape(B, R, _LANES)  # noqa: E731
    outs = pl.pallas_call(
        kernel,
        out_shape=(shp, shp, shp, shp),
        grid=(B,),
        in_specs=[spec] * 4,
        out_specs=(spec,) * 4,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(rs(skey.astype(jnp.int32)), rs(v1.astype(jnp.int32)),
      rs(v2.astype(jnp.int32)), rs(v3.astype(jnp.int32)))
    return tuple(o.reshape(B, N) for o in outs)


def run_totals(skey: jnp.ndarray, v1: jnp.ndarray, v2: jnp.ndarray,
               v3: jnp.ndarray):
    """Batched per-element run totals: Pallas on TPU, segsort elsewhere.

    Same contract as :func:`run_totals_pallas`; the fallback composes
    ops/segsort primitives (the independent oracle)."""
    if available() and skey.shape[-1] % _LANES == 0:
        return run_totals_pallas(skey, v1, v2, v3)
    from cl4wsis_tpu.ops import segsort as ss

    def one_row(k, a, b, c):
        starts = ss.run_starts(k)
        ends = ss.run_ends(k)
        return (ss.seg_length(starts, ends),
                ss.seg_total(a, starts, ends),
                ss.seg_total(b, starts, ends),
                ss.seg_total(c, starts, ends))

    return jax.vmap(one_row)(skey, v1, v2, v3)


def run_totals1(skey: jnp.ndarray, v1: jnp.ndarray, v2: jnp.ndarray,
                v3: jnp.ndarray):
    """Per-image (N,) variant for use under ``jax.vmap`` — a custom_vmap
    routes the batched case straight to the (B, N) Pallas kernel (the same
    pattern as ops/pallas_cc), avoiding reliance on pallas_call's generic
    batching; off-TPU it composes ops/segsort primitives."""
    from cl4wsis_tpu.ops import segsort as ss

    def fallback(k, a, b, c):
        starts = ss.run_starts(k)
        ends = ss.run_ends(k)
        return (ss.seg_length(starts, ends),
                ss.seg_total(a, starts, ends),
                ss.seg_total(b, starts, ends),
                ss.seg_total(c, starts, ends))

    if not (available() and skey.shape[-1] % _LANES == 0):
        return fallback(skey, v1, v2, v3)

    fn = jax.custom_batching.custom_vmap(
        lambda k, a, b, c: tuple(
            o[0] for o in run_totals_pallas(k[None], a[None], b[None],
                                            c[None])))

    @fn.def_vmap
    def _vmap_rule(axis_size, in_batched, k, a, b, c):
        # constants (e.g. a zeros payload) arrive unbatched — broadcast
        k, a, b, c = (
            x if bt else jnp.broadcast_to(x, (axis_size,) + x.shape)
            for x, bt in zip((k, a, b, c), in_batched))
        return run_totals_pallas(k, a, b, c), (True,) * 4

    return fn(skey, v1, v2, v3)
