"""PAMR: pixel-adaptive mask refinement as pure XLA ops.

Re-design of reference ``wss/modules.py:17-152``: the reference implements
the 8-neighbor shifts as grouped conv2d with fixed +/-1 kernels; on TPU the
same computation is cheaper as replicate-pad + slice (pure data movement,
fused by XLA, no MXU waste on 0/1 kernels).

Affinity: for each dilation d and each of the 8 neighbors, the kernel
computes |x - shift_d(x)| normalized by the local 3x3 std, softmax over the
(8 * n_dilations) shift axis after averaging over RGB; then `num_iter`
rounds of mask propagation mask <- sum_shifts affinity * shift(mask).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from cl4wsis_tpu.ops.resize import resize_bilinear

# (dy, dx) of the 8 neighbors in the reference kernel order
_OFFSETS: Tuple[Tuple[int, int], ...] = (
    (-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1))


def _shift(x: jnp.ndarray, dy: int, dx: int, d: int) -> jnp.ndarray:
    """Neighbor value at offset (dy*d, dx*d) with replicate padding, NHWC."""
    pad = ((0, 0), (d, d), (d, d), (0, 0))
    xp = jnp.pad(x, pad, mode="edge")
    H, W = x.shape[1], x.shape[2]
    return jax.lax.dynamic_slice(
        xp, (0, d + dy * d, d + dx * d, 0), (x.shape[0], H, W, x.shape[3]))


def _neighbors(x: jnp.ndarray, dilations: Sequence[int]) -> jnp.ndarray:
    """Stack of neighbor values, (B, H, W, C, 8*D)."""
    outs = [_shift(x, dy, dx, d) for d in dilations for dy, dx in _OFFSETS]
    return jnp.stack(outs, axis=-1)


def _local_std(x: jnp.ndarray, dilations: Sequence[int]) -> jnp.ndarray:
    """Std over ALL 9*D taps jointly (8 neighbors per dilation + center
    repeated per dilation), (B, H, W, C, 1).

    Matches reference LocalStDev: the torch `.std(2)` (unbiased) reduces the
    concatenated 9*n_dilations tap axis, NOT per dilation.
    """
    taps = [_shift(x, dy, dx, d) for d in dilations for dy, dx in _OFFSETS]
    taps += [x] * len(dilations)  # the center tap appears once per dilation
    t = jnp.stack(taps, axis=-1)
    mean = jnp.mean(t, axis=-1, keepdims=True)
    var = jnp.sum(jnp.square(t - mean), axis=-1, keepdims=True) / (t.shape[-1] - 1)
    return jnp.sqrt(var)


@partial(jax.jit, static_argnames=("num_iter", "dilations"))
def pamr(image: jnp.ndarray, mask: jnp.ndarray, num_iter: int = 10,
         dilations: Sequence[int] = (1, 2, 4, 8, 12)) -> jnp.ndarray:
    """Refine `mask` (B,h,w,C probabilities) with affinities from `image`.

    `image` is (B,H,W,3) denormalized RGB; the mask is resized to the image
    resolution first (align_corners=True, reference ``wss/modules.py:133``).
    """
    size = image.shape[1:3]
    mask = resize_bilinear(mask.astype(jnp.float32), size, align_corners=True)
    image = image.astype(jnp.float32)

    x_std = _local_std(image, dilations)                      # B,H,W,3,1
    diff = jnp.abs(_neighbors(image, dilations) - image[..., None])  # B,H,W,3,8D
    aff = -diff / (1e-8 + 0.1 * x_std)
    aff = jnp.mean(aff, axis=3)                               # mean over RGB: B,H,W,8D
    aff = jax.nn.softmax(aff, axis=-1)

    def body(m, _):
        neigh = _neighbors(m, dilations)                      # B,H,W,C,8D
        m = jnp.sum(neigh * aff[:, :, :, None, :], axis=-1)
        return m, None

    mask, _ = jax.lax.scan(body, mask, None, length=num_iter)
    return mask
