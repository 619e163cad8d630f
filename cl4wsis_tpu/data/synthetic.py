"""Synthetic instance-segmentation data for smoke tests and benchmarks.

Generates images with colored rectangular/elliptical "objects" whose masks
are exactly recoverable, so losses go down and eval post-processing finds
real instances. Mirrors the batch contract of the VOC/COCO pipelines:
image (normalized float NHWC), seg (int, 0 bg / 1..C things / 255 ignore),
inst (dense ids 1..K), l1h (image-level one-hot over 1..C).
"""

from __future__ import annotations

from typing import Dict, Iterator, Tuple

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def make_sample(rng: np.random.RandomState, size: int, n_classes: int,
                max_objects: int = 4) -> Dict[str, np.ndarray]:
    img = rng.rand(size, size, 3).astype(np.float32) * 0.2
    seg = np.zeros((size, size), np.int32)
    inst = np.zeros((size, size), np.int32)
    n_obj = rng.randint(1, max_objects + 1)
    l1h = np.zeros((n_classes + 1,), np.float32)
    for k in range(1, n_obj + 1):
        cls = rng.randint(1, n_classes + 1)
        h = rng.randint(size // 8, size // 3)
        w = rng.randint(size // 8, size // 3)
        y = rng.randint(0, size - h)
        x = rng.randint(0, size - w)
        yy, xx = np.mgrid[0:size, 0:size]
        if rng.rand() < 0.5:
            mask = (yy >= y) & (yy < y + h) & (xx >= x) & (xx < x + w)
        else:
            cy, cx = y + h / 2, x + w / 2
            mask = ((yy - cy) / (h / 2)) ** 2 + ((xx - cx) / (w / 2)) ** 2 <= 1.0
        seg[mask] = cls
        inst[mask] = k
        color = np.array([0.3 + 0.7 * (cls % 3 == 0), 0.3 + 0.7 * (cls % 3 == 1),
                          0.3 + 0.7 * (cls % 3 == 2)], np.float32)
        img[mask] = color + rng.randn(3).astype(np.float32) * 0.05
        l1h[cls] = 1.0
    img = (np.clip(img, 0, 1) - IMAGENET_MEAN) / IMAGENET_STD
    return {"image": img, "seg": seg, "inst": inst, "l1h": l1h}


def synthetic_batches(batch_size: int, size: int, n_classes: int,
                      seed: int = 0, n_batches: int | None = None
                      ) -> Iterator[Dict[str, np.ndarray]]:
    rng = np.random.RandomState(seed)
    i = 0
    while n_batches is None or i < n_batches:
        samples = [make_sample(rng, size, n_classes) for _ in range(batch_size)]
        yield {k: np.stack([s[k] for s in samples]) for k in samples[0]}
        i += 1
