"""Fused affine + leaky-ReLU Pallas kernel (the InPlace-ABN elementwise pass).

Decomposition rationale (vs the reference's monolithic CUDA iabn,
``segmentation_module.py:17-29``): under jit with a batch sharded over the
data mesh, batch statistics MUST be a global-array reduction so XLA inserts
the cross-chip collective (that is the 'Sync' in InPlaceABNSync). The
remaining work — y = lrelu(x * inv + shift) and its backward — is a pure
elementwise HBM-bandwidth pass, which this kernel fuses into a single
read-modify-write with a custom VJP (no separate activation buffer, the
in-place-ABN memory win).

Used by core.abn.ABN when running on TPU; falls back to jnp elsewhere.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

_BLOCK_M = 256

# Opt-in: a pallas_call is a fusion barrier, and XLA already fuses the BN
# affine+activation into the producing conv's epilogue. The kernel exists
# for cases where that fusion is defeated (e.g. remat boundaries) — flip on
# with CL4WSIS_PALLAS_ABN=1 and A/B with bench.py on real hardware.
import os

ENABLED = os.environ.get("CL4WSIS_PALLAS_ABN", "0") == "1"


def _on_tpu() -> bool:
    try:
        return ENABLED and jax.default_backend() == "tpu" and _HAS_PALLAS
    except Exception:  # pragma: no cover
        return False


def _fwd_kernel(x_ref, inv_ref, shift_ref, out_ref, *, slope: float):
    y = x_ref[:].astype(jnp.float32) * inv_ref[:] + shift_ref[:]
    out_ref[:] = jnp.where(y >= 0, y, slope * y).astype(out_ref.dtype)


def _bwd_kernel(g_ref, y_ref, inv_ref, dx_ref, *, slope: float):
    mask = jnp.where(y_ref[:] >= 0, 1.0, slope)
    dx_ref[:] = (g_ref[:].astype(jnp.float32) * mask * inv_ref[:]).astype(dx_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _run_rowwise(kernel, out_dtype, arrays, c):
    """Grid over row blocks; channel vectors are broadcast to each block.

    Shapes are padded to hardware tiles (rows to the block size, channels to
    128 lanes) — unaligned tiles compile pathologically on TPU."""
    m = arrays[0].shape[0]
    cp = _round_up(c, 128)
    bm = min(_BLOCK_M, _round_up(m, 8))
    mp = _round_up(m, bm)

    padded = []
    for a in arrays:
        pad_rows = (mp - m) if a.shape[0] == m else 0
        pad_cols = cp - c
        if pad_rows or pad_cols:
            a = jnp.pad(a, ((0, pad_rows), (0, pad_cols)))
        padded.append(a)

    row_spec = pl.BlockSpec((bm, cp), lambda i: (i, 0), memory_space=pltpu.VMEM)
    chan_spec = pl.BlockSpec((1, cp), lambda i: (0, 0), memory_space=pltpu.VMEM)
    specs = [row_spec if a.shape[0] == mp else chan_spec for a in padded]
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((mp, cp), out_dtype),
        grid=(mp // bm,),
        in_specs=specs,
        out_specs=row_spec,
    )(*padded)
    return out[:m, :c]


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_affine_act(x: jnp.ndarray, inv: jnp.ndarray, shift: jnp.ndarray,
                     slope: float = 0.01) -> jnp.ndarray:
    """y = leaky_relu(x * inv + shift); x is (..., C), inv/shift are (C,)."""
    return _fused_fwd_impl(x, inv, shift, slope)


def _fused_fwd_impl(x, inv, shift, slope):
    if not _on_tpu():
        y = x.astype(jnp.float32) * inv + shift
        return jnp.where(y >= 0, y, slope * y).astype(x.dtype)
    shape = x.shape
    c = shape[-1]
    x2 = x.reshape(-1, c)
    out = _run_rowwise(partial(_fwd_kernel, slope=slope), x.dtype,
                       [x2, inv.reshape(1, c).astype(jnp.float32),
                        shift.reshape(1, c).astype(jnp.float32)], c)
    return out.reshape(shape)


def _fused_fwd(x, inv, shift, slope):
    y = _fused_fwd_impl(x, inv, shift, slope)
    return y, (x, y, inv)


def _fused_bwd(slope, res, g):
    x, y, inv = res
    c = x.shape[-1]
    if _on_tpu():
        g2 = g.reshape(-1, c)
        y2 = y.reshape(-1, c).astype(jnp.float32)
        dx = _run_rowwise(partial(_bwd_kernel, slope=slope), x.dtype,
                          [g2, y2, inv.reshape(1, c).astype(jnp.float32)], c)
        dx = dx.reshape(x.shape)
    else:
        mask = jnp.where(y >= 0, 1.0, slope)
        dx = (g.astype(jnp.float32) * mask * inv).astype(x.dtype)
    mask = jnp.where(y >= 0, 1.0, slope).astype(jnp.float32)
    gm = g.astype(jnp.float32) * mask
    axes = tuple(range(x.ndim - 1))
    dinv = jnp.sum(gm * x.astype(jnp.float32), axis=axes)
    dshift = jnp.sum(gm, axis=axes)
    return dx, dinv, dshift


fused_affine_act.defvjp(_fused_fwd, _fused_bwd)
