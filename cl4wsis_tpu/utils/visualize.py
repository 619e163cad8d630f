"""Visualization helpers: color maps, label->color, denormalization.

Re-design of reference ``utils/utils.py``: voc/cityscapes/ade colormaps,
Label2Color, denorm, label_to_one_hot.
"""

from __future__ import annotations

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def denorm(image: np.ndarray) -> np.ndarray:
    """Invert ImageNet normalization; NHWC or HWC."""
    return image * IMAGENET_STD + IMAGENET_MEAN


def label_to_one_hot(labels: np.ndarray, num_classes: int) -> np.ndarray:
    """(...,) int -> (..., C) one-hot (reference utils/utils.py:7-10)."""
    return np.eye(num_classes, dtype=np.float32)[labels]


def voc_cmap(n: int = 256, normalized: bool = False) -> np.ndarray:
    """The canonical VOC bit-interleaved colormap."""
    def bitget(v, i):
        return (v >> i) & 1

    cmap = np.zeros((n, 3), np.uint8)
    for i in range(n):
        r = g = b = 0
        c = i
        for j in range(8):
            r |= bitget(c, 0) << (7 - j)
            g |= bitget(c, 1) << (7 - j)
            b |= bitget(c, 2) << (7 - j)
            c >>= 3
        cmap[i] = [r, g, b]
    return cmap / 255.0 if normalized else cmap


# 19-class cityscapes palette (reference utils/utils.py:62-258 subset)
CITYSCAPES_CMAP = np.array([
    [128, 64, 128], [244, 35, 232], [70, 70, 70], [102, 102, 156],
    [190, 153, 153], [153, 153, 153], [250, 170, 30], [220, 220, 0],
    [107, 142, 35], [152, 251, 152], [70, 130, 180], [220, 20, 60],
    [255, 0, 0], [0, 0, 142], [0, 0, 70], [0, 60, 100], [0, 80, 100],
    [0, 0, 230], [119, 11, 32]], np.uint8)


class Label2Color:
    """Map an int label image to RGB using a colormap."""

    def __init__(self, cmap: np.ndarray):
        self.cmap = cmap

    def __call__(self, lbls: np.ndarray) -> np.ndarray:
        return self.cmap[np.clip(lbls, 0, len(self.cmap) - 1)]
