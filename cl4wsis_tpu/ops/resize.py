"""Bilinear resize with explicit align_corners semantics.

``jax.image.resize`` only implements half-pixel (align_corners=False)
sampling; the reference mixes both conventions — align_corners=False for
semantic-logit upsampling (``segmentation_module.py:156``) and
align_corners=True for decoder fusion and prediction upsampling
(``modules/panoptic_deeplab.py:98,189``, ``segmentation_module.py:438``).
This separable gather-based implementation matches torch
``F.interpolate(mode='bilinear')`` for both.
"""

from __future__ import annotations

from typing import Tuple

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


def resize_bilinear(x: jnp.ndarray, size: Tuple[int, int],
                    align_corners: bool = False) -> jnp.ndarray:
    """Resize NHWC (or HWC) `x` to spatial `size` with bilinear sampling."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    _, H, W, _ = x.shape
    h, w = size
    if (H, W) == (h, w):
        return x[0] if squeeze else x

    dtype = x.dtype
    xf = x.astype(jnp.float32)

    ylo, yhi, wy = _axis_weights(H, h, align_corners)
    rows = jnp.take(xf, ylo, axis=1) * (1.0 - wy)[None, :, None, None] + \
        jnp.take(xf, yhi, axis=1) * wy[None, :, None, None]

    xlo, xhi, wx = _axis_weights(W, w, align_corners)
    out = jnp.take(rows, xlo, axis=2) * (1.0 - wx)[None, None, :, None] + \
        jnp.take(rows, xhi, axis=2) * wx[None, None, :, None]

    out = out.astype(dtype)
    return out[0] if squeeze else out
