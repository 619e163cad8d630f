"""Peak extraction: max-pool NMS + per-class top-K, fully on device.

Re-design of reference ``wss/utils.py:3-25`` (peak_extract, which copies to
host numpy) and ``dataset/utils.py:255-297`` — here the (scores, ys, xs)
stay on device as static-shape (B, C, K) arrays.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from cl4wsis_tpu.ops.topk import topk_hier


def _pad_identity(dtype):
    if jnp.issubdtype(dtype, jnp.floating):
        return -jnp.inf
    return jnp.iinfo(dtype).min


def _shift_axis(x: jnp.ndarray, axis: int, s: int, fill) -> jnp.ndarray:
    """out[i] = x[i + s] along `axis`, `fill` outside."""
    if s == 0:
        return x
    n = x.shape[axis]
    pad = [(0, 0)] * x.ndim
    sl = [slice(None)] * x.ndim
    if s > 0:
        pad[axis] = (0, s)
        sl[axis] = slice(s, s + n)
    else:
        pad[axis] = (-s, 0)
        sl[axis] = slice(0, n)
    return jnp.pad(x, pad, constant_values=fill)[tuple(sl)]


def _window_max_1d(x: jnp.ndarray, axis: int, length: int, fill,
                   backward: bool = False) -> jnp.ndarray:
    """Forward: m[i] = max(x[i .. i+length-1]); backward: m[i] =
    max(x[i-length+1 .. i]). Power-of-two doubling: O(log k) full-plane
    maxes instead of the O(k^2) 2-D reduce_window."""
    if length <= 1:
        return x
    sgn = -1 if backward else 1
    pows = [x]  # pows[j] covers a window of 2^j anchored at i
    p = 1
    while p * 2 <= length:
        prev = pows[-1]
        pows.append(jnp.maximum(prev, _shift_axis(prev, axis, sgn * p, fill)))
        p *= 2
    res, done = x, 1
    while done < length:
        p = 1 << ((length - done).bit_length() - 1)
        res = jnp.maximum(res, _shift_axis(pows[p.bit_length() - 1],
                                           axis, sgn * done, fill))
        done += p
    return res


def _centered_max_1d(x: jnp.ndarray, axis: int, kernel: int, fill) -> jnp.ndarray:
    """out[i] = max(x[i-pad .. i+kernel-1-pad]), pad = (kernel-1)//2 — the
    1-D slice of nn.max_pool's same-padding window, as the max of a
    backward window [i-pad, i] and a forward window [i, i+kernel-1-pad]
    (no pre/post shifting: boundary windows keep their in-range taps)."""
    pad = (kernel - 1) // 2
    bwd = _window_max_1d(x, axis, pad + 1, fill, backward=True)
    fwd = _window_max_1d(x, axis, kernel - pad, fill, backward=False)
    return jnp.maximum(bwd, fwd)


def max_pool_same(x: jnp.ndarray, kernel: int) -> jnp.ndarray:
    """Max pool stride 1, same padding (NHWC) == ``nn.max_pool``.

    Separable + log-decomposed: the naive 2-D reduce_window reads k^2
    values per pixel (1681 at the refine NMS kernel 41 — profiled 254 ms/
    step, the single hottest op of phase 2); two 1-D doubling passes do it
    in ~4*log2(k) full-plane maxes. Exactness vs nn.max_pool is pinned by
    tests/test_wss.py."""
    if kernel % 2 == 0:  # even windows shrink the output (k-1 pad total);
        pad = (kernel - 1) // 2  # unused by callers — keep exact reference
        return nn.max_pool(x, (kernel, kernel), strides=(1, 1),
                           padding=[(pad, pad), (pad, pad)])
    fill = _pad_identity(x.dtype)
    y = _centered_max_1d(x, 1, kernel, fill)
    return _centered_max_1d(y, 2, kernel, fill)


def avg_pool_same(x: jnp.ndarray, kernel: int) -> jnp.ndarray:
    """Avg pool stride 1, same padding — torch count_include_pad=True
    semantics (divides by kernel^2 even at borders), matching the reference
    `smoothing` (``wss/utils.py:28-32``)."""
    pad = (kernel - 1) // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    return nn.avg_pool(xp, (kernel, kernel), strides=(1, 1), padding="VALID")


smoothing = partial(avg_pool_same, kernel=3)


@partial(jax.jit, static_argnames=("kernel", "k"))
def peak_extract(heat: jnp.ndarray, kernel: int = 5, k: int = 25
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """NMS + top-k peaks per class.

    heat: (B, H, W, C). Returns (scores, ys, xs), each (B, C, k).
    """
    B, H, W, C = heat.shape
    hmax = max_pool_same(heat, kernel)
    keep = (hmax == heat).astype(heat.dtype)
    peak = (heat * keep).transpose(0, 3, 1, 2).reshape(B, C, H * W)
    scores, inds = topk_hier(peak, k)
    ys = (inds // W).astype(jnp.int32)
    xs = (inds % W).astype(jnp.int32)
    return scores.astype(jnp.float32), ys, xs


@partial(jax.jit, static_argnames=("kernel", "k"))
def peak_extract_nchw(heat: jnp.ndarray, kernel: int = 5, k: int = 25
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """peak_extract for channel-first (B, C, H, W) heat — no full-resolution
    relayout (that transpose alone profiled ~0.3s/step at 512^2 bf16)."""
    B, C, H, W = heat.shape
    x = heat.reshape(B * C, H, W)[..., None]
    hmax = max_pool_same(x, kernel)[..., 0].reshape(B, C, H, W)
    keep = (hmax == heat).astype(heat.dtype)
    peak = (heat * keep).reshape(B, C, H * W)
    scores, inds = topk_hier(peak, k)
    ys = (inds // W).astype(jnp.int32)
    xs = (inds % W).astype(jnp.int32)
    return scores.astype(jnp.float32), ys, xs
