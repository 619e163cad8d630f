"""Pallas exact top-k for long rows.

``ops/topk.topk_hier`` bounds ``jax.lax.top_k``'s full-row sort to
1024-wide chunk sorts, but at the label factory's row length (HW = 262144,
B*C = 80 rows) those [*, 256, 1024] stable sorts still cost ~5 ms/call on
the round-4 phase-2 device trace — twice per step (CAM peak extraction +
refine NMS centers), plus the HBM<->staging copies the sort custom call
requires.

Peaks are k << N (25/16 of 262144), so sorting anything is waste. This
kernel holds one row in VMEM and extracts the top-k iteratively at O(N +
k*sqrt(N)) work instead of O(N log N): a per-sublane-row running max (256
values) is maintained so each extraction only scans that small vector,
re-scans the ONE 1024-wide row the winner came from, and re-reduces it.
Tie order matches jax.lax.top_k exactly (stable: equal values surface in
increasing flat-index order) because both the row pick and the in-row pick
take the FIRST position attaining the max.

Used by ops/topk.topk_hier as the TPU path; the chunked-sort composition
stays as the off-TPU fallback and test oracle. CL4WSIS_PALLAS_TOPK=0
disables.
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

ENABLED = os.environ.get("CL4WSIS_PALLAS_TOPK", "1") == "1"
_LANES = 128
_ROWW = 1024          # VMEM view is (N // _ROWW, _ROWW)


def available() -> bool:
    try:
        return ENABLED and _HAS_PALLAS and jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _first_argmax_2d(v, m):
    """Lowest lane index j with v[0, j] == m; v is (1, n)."""
    n = v.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    return jnp.min(jnp.where(v == m, lane, n))


def _kernel(x_ref, vals_ref, idx_ref, buf, rowmax, *, K, R, KP):
    buf[:] = x_ref[0]
    # per-1024-row running max, kept as a (1, R) lane vector
    rowmax[:] = jnp.max(buf[:], axis=1)[None]
    vals_ref[:] = jnp.full((1, 8, KP), -jnp.inf, jnp.float32)
    idx_ref[:] = jnp.zeros((1, 8, KP), jnp.int32)

    out_lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8, KP), 2)
    out_sub = jax.lax.broadcasted_iota(jnp.int32, (1, 8, KP), 1)
    rm_lane = jax.lax.broadcasted_iota(jnp.int32, (1, R), 1)

    def step(t, _):
        rm = rowmax[:]
        gm = jnp.max(rm)
        r = _first_argmax_2d(rm, gm)
        row = buf[pl.ds(r, 1), :]                 # (1, _ROWW)
        c = _first_argmax_2d(row, gm)
        # scalar stores to VMEM are unsupported — masked tile stores
        sel = (out_sub == 0) & (out_lane == t)
        vals_ref[:] = jnp.where(sel, gm, vals_ref[:])
        idx_ref[:] = jnp.where(sel, r * _ROWW + c, idx_ref[:])
        # knock the winner out with NaN (never equal to any gm, including
        # -inf, so extracted winners can't alias genuine -inf entries) and
        # refresh that row's cached max over the non-knocked entries
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, _ROWW), 1)
        row = jnp.where(lane == c, jnp.nan, row)
        buf[pl.ds(r, 1), :] = row
        clean = jnp.where(row != row, -jnp.inf, row)
        rowmax[:] = jnp.where(rm_lane == r, jnp.max(clean), rowmax[:])
        return 0

    jax.lax.fori_loop(0, K, step, 0)


@partial(jax.jit, static_argnames=("k",))
def topk_pallas(x: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact (values, indices) top-k along the last axis.

    x: (B, N) float32, N a multiple of 1024, NaN-free (-inf is fine; NaN is
    the kernel's internal knockout sentinel). Matches jax.lax.top_k
    (descending values, stable tie order by lower index). k < 1024 so no
    VMEM row can be fully knocked out mid-extraction.
    """
    B, N = x.shape
    assert N % _ROWW == 0 and k <= N and k < _ROWW
    R = N // _ROWW
    KP = max(_LANES, ((k + _LANES - 1) // _LANES) * _LANES)

    # outputs padded to an (8, KP) tile per row (Mosaic block alignment);
    # only sublane 0 is written
    vals, idx = pl.pallas_call(
        partial(_kernel, K=k, R=R, KP=KP),
        out_shape=(jax.ShapeDtypeStruct((B, 8, KP), jnp.float32),
                   jax.ShapeDtypeStruct((B, 8, KP), jnp.int32)),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, R, _ROWW), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, 8, KP), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 8, KP), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((R, _ROWW), jnp.float32),
                        pltpu.VMEM((1, R), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x.astype(jnp.float32).reshape(B, R, _ROWW))
    return vals[:, 0, :k], idx[:, 0, :k]
