"""Multi-scale + flip test-time augmentation fusion.

Re-design of reference ``segmentation_module.py:203-235`` (TestAugmentation,
mean/sum fusion). Pure function: applies `apply_fn` (image -> class logits
NHWC) at each scale and optionally on the horizontal flip, fuses resized
logits, returns (fused_logits, argmax).
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax.numpy as jnp

from cl4wsis_tpu.ops.resize import resize_bilinear


def test_augmentation(apply_fn: Callable[[jnp.ndarray], jnp.ndarray],
                      x: jnp.ndarray,
                      scales: Sequence[float] = (1.0,),
                      do_flip: bool = True,
                      fusion: str = "mean"
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    assert fusion in ("mean", "sum")
    H, W = x.shape[1:3]
    total = None
    count = 0
    for scale in scales:
        if scale != 1.0:
            size = (round(H * scale), round(W * scale))
            xs = resize_bilinear(x, size, align_corners=False)
        else:
            xs = x
        batch = jnp.concatenate([xs, jnp.flip(xs, axis=2)], axis=0) \
            if do_flip else xs
        logits = apply_fn(batch)
        logits = resize_bilinear(logits, (H, W), align_corners=False)
        if do_flip:
            b = x.shape[0]
            parts = [logits[:b], jnp.flip(logits[b:], axis=2)]
        else:
            parts = [logits]
        for p in parts:
            total = p if total is None else total + p
            count += 1
    fused = total / count if fusion == "mean" else total
    return fused, jnp.argmax(fused, axis=-1)
