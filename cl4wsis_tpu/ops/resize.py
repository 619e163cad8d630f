"""Bilinear resize with explicit align_corners semantics.

``jax.image.resize`` only implements half-pixel (align_corners=False)
sampling; the reference mixes both conventions — align_corners=False for
semantic-logit upsampling (``segmentation_module.py:156``) and
align_corners=True for decoder fusion and prediction upsampling
(``modules/panoptic_deeplab.py:98,189``, ``segmentation_module.py:438``).
This separable implementation (two small dense interpolation matmuls, MXU-
resident) matches torch ``F.interpolate(mode='bilinear')`` for both.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _axis_weights(in_size: int, out_size: int, align_corners: bool):
    if out_size == in_size:
        idx = jnp.arange(in_size)
        return idx, idx, jnp.zeros((out_size,), jnp.float32)
    if align_corners and out_size > 1:
        src = jnp.linspace(0.0, in_size - 1.0, out_size)
    elif align_corners:
        src = jnp.zeros((out_size,))
    else:
        src = (jnp.arange(out_size) + 0.5) * (in_size / out_size) - 0.5
        src = jnp.clip(src, 0.0, in_size - 1.0)
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, in_size - 1)
    w = (src - lo).astype(jnp.float32)
    return lo, hi, w


def _axis_matrix(in_size: int, out_size: int, align_corners: bool):
    """Dense (out, in) interpolation matrix (two nonzeros per row)."""
    lo, hi, w = _axis_weights(in_size, out_size, align_corners)
    eye = jnp.eye(in_size, dtype=jnp.float32)
    return eye[lo] * (1.0 - w)[:, None] + eye[hi] * w[:, None]


def resize_bilinear(x: jnp.ndarray, size: Tuple[int, int],
                    align_corners: bool = False) -> jnp.ndarray:
    """Resize NHWC (or HWC) `x` to spatial `size` with bilinear sampling.

    Separable interpolation expressed as two small dense matmuls — they run
    on the MXU instead of lowering to gathers, which profiled ~30x slower
    for the phase-2 CAM upsample (docs/verification.md round-2 series).

    Numerics caveat: the dense-matrix form makes every output pixel a
    weighted sum over the whole input axis (zero weights included), so a
    NaN/Inf anywhere in an input row/column pollutes the entire output
    along that axis (0*NaN = NaN) — unlike a 2-tap gather, which keeps bad
    values local. Deliberate perf tradeoff; during divergence debugging,
    localize the origin with ``jax.debug`` checks on the *input* maps, not
    the resized ones."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    _, H, W, _ = x.shape
    h, w = size
    if (H, W) == (h, w):
        return x[0] if squeeze else x

    dtype = x.dtype
    out = x.astype(jnp.float32)
    if h != H:
        m_h = _axis_matrix(H, h, align_corners)
        out = jnp.einsum("oh,bhwc->bowc", m_h, out,
                         precision=jax.lax.Precision.HIGHEST)
    if w != W:
        m_w = _axis_matrix(W, w, align_corners)
        out = jnp.einsum("ow,bhwc->bhoc", m_w, out,
                         precision=jax.lax.Precision.HIGHEST)

    out = out.astype(dtype)
    return out[0] if squeeze else out


def resize_bilinear_nchw(x: jnp.ndarray, size: Tuple[int, int],
                         align_corners: bool = False) -> jnp.ndarray:
    """resize_bilinear for channel-first (B, C, H, W) input — bit-identical
    contractions, no layout change. Lets callers that need channel-major
    output (per-class top-k) transpose at the SMALL resolution instead of
    paying a full-res relayout copy."""
    _, _, H, W = x.shape
    h, w = size
    if (H, W) == (h, w):
        return x
    dtype = x.dtype
    out = x.astype(jnp.float32)
    if h != H:
        out = jnp.einsum("oh,bchw->bcow", _axis_matrix(H, h, align_corners),
                         out, precision=jax.lax.Precision.HIGHEST)
    if w != W:
        out = jnp.einsum("ow,bchw->bcho", _axis_matrix(W, w, align_corners),
                         out, precision=jax.lax.Precision.HIGHEST)
    return out.astype(dtype)
