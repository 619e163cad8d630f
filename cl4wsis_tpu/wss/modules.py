"""Weak-supervision trainable modules: PseudoLabeler, PAM, PeakGenerator.

Re-design of reference ``wss/modules.py:322-434``. NHWC, fused-ABN norms.
The reference PeakGenerator hardcodes `.cuda()` for the old-class zero pads
(``wss/modules.py:400-401``); here padding is pure functional concatenation.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from cl4wsis_tpu.core.abn import ABN
from cl4wsis_tpu.ops.resize import resize_bilinear


class PseudoLabeler(nn.Module):
    """2x (3x3 conv + ABN) + 1x1 classifier over backbone body features."""

    num_classes: int
    hidden: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = nn.Conv(self.hidden, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = ABN(features=self.hidden, name="norm1")(y, train=train)
        y = nn.Conv(self.hidden, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = ABN(features=self.hidden, name="norm2")(y, train=train)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="cls")(y)


def pam(x: jnp.ndarray, alpha: float = 0.7) -> jnp.ndarray:
    """Peak-attention masking: zero activations below alpha * channel max
    (reference ``wss/modules.py:346-368``)."""
    x = nn.relu(x)
    peak = jnp.max(x, axis=(1, 2), keepdims=True)
    return jnp.where(x < peak * alpha, 0.0, x)


def ngwp(x: jnp.ndarray) -> jnp.ndarray:
    """Normalized global weighted pooling logits, (B,H,W,C) -> (B,C)
    (reference ``wss/modules.py:412-423``)."""
    B, H, W, C = x.shape
    masks = jnp.reshape(jax.nn.softmax(x.astype(jnp.float32), axis=-1), (B, H * W, C))
    logits = jnp.reshape(x.astype(jnp.float32), (B, H * W, C))
    return jnp.sum(logits * masks, axis=1) / (1.0 + jnp.sum(masks, axis=1))


class PeakGenerator(nn.Module):
    """PAM + 1x1 conv on new-class CAM channels; nGWP image logits.

    `num_classes` = total thing classes (tot - 1); `old_classes` = old thing
    classes (old - 1). Output logits/maps are zero-padded over old channels.
    In eval mode returns (logits, cam): label-masked, max-normalized CAM
    upsampled to `size` (align_corners=False).
    """

    num_classes: int
    old_classes: int
    alpha: float = 0.7
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, label: Optional[jnp.ndarray] = None,
                 size: Optional[Tuple[int, int]] = None, train: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if size is None:
            size = x.shape[1:3]
        B = x.shape[0]
        new_classes = self.num_classes - self.old_classes

        y = x[..., -new_classes:]
        y = pam(y, self.alpha)
        y = nn.Conv(new_classes, (1, 1), dtype=self.dtype,
                    kernel_init=nn.initializers.normal(stddev=(2.0 / new_classes) ** 0.5),
                    name="extra_conv4")(y)
        logit = ngwp(y)
        if self.old_classes > 0:
            logit = jnp.concatenate(
                [jnp.zeros((B, self.old_classes), logit.dtype), logit], axis=-1)
            y = jnp.concatenate(
                [jnp.zeros(y.shape[:3] + (self.old_classes,), y.dtype), y], axis=-1)

        if train:
            return logit, y
        cam = self._cam_normalize(jax.lax.stop_gradient(y), size, label)
        return logit, cam

    def _cam_normalize(self, cam: jnp.ndarray, size, label: jnp.ndarray) -> jnp.ndarray:
        cam = nn.relu(cam)
        if label is not None:
            cam = cam * label[:, None, None, :]
        cam = resize_bilinear(cam, tuple(size), align_corners=False)
        cam = cam / (jnp.max(cam, axis=(1, 2), keepdims=True) + 1e-5)
        return cam
