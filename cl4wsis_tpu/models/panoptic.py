"""Panoptic-DeepLab instance decoder + incremental center/offset head.

Re-design of reference ``modules/panoptic_deeplab.py``: plain-BN ASPP with
atrous rates (3,6,9), a top-down decoder fusing res4/res3/res2 via 1x1
projections and 5x5 depthwise-separable convs, and an incremental head —
'center' (per-step thing-class channels) and 'offset' (2 channels).

Instance-branch geometry (``modules/panoptic_deeplab.py:395-404,432-468``):
ASPP channels 256, decoder channels 128, low-level projections (64,32,16),
center fuse 128->128, offset fuse 128->32. Norms here are plain BN+ReLU (the
reference uses torch BatchNorm2d, not iABN) — expressed as the same fused ABN
module with relu activation (identical math).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

from cl4wsis_tpu.core.abn import ABN
from cl4wsis_tpu.ops.resize import resize_bilinear


def _bn_relu(features: int, name: str) -> ABN:
    return ABN(features=features, activation="relu", name=name)


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 1
    dilation: int = 1
    groups: int = 1
    use_bias: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        k, d = self.kernel, self.dilation
        y = nn.Conv(self.features, (k, k), kernel_dilation=(d, d),
                    padding=[(d * (k - 1) // 2,) * 2] * 2,
                    feature_group_count=self.groups,
                    use_bias=self.use_bias, dtype=self.dtype, name="conv")(x)
        return ABN(features=self.features, activation="relu", name="bn")(y, train=train)


class DepthwiseSeparableConv(nn.Module):
    """5x5 depthwise conv + BN + ReLU, then 1x1 pointwise + BN + ReLU."""

    features: int
    kernel: int = 5
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cin = x.shape[-1]
        y = ConvBNReLU(cin, kernel=self.kernel, groups=cin, use_bias=False,
                       dtype=self.dtype, name="depthwise")(x, train=train)
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="pointwise")(y)
        return _bn_relu(self.features, "pointwise_bn")(y, train=train)


class ASPP(nn.Module):
    """Plain-BN ASPP: 1x1 + three atrous 3x3 + GAP branch, projected."""

    out_channels: int = 256
    atrous_rates: Sequence[int] = (3, 6, 9)
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        branches = [ConvBNReLU(self.out_channels, kernel=1, dtype=self.dtype,
                               name="branch0")(x, train=train)]
        for i, r in enumerate(self.atrous_rates):
            branches.append(ConvBNReLU(self.out_channels, kernel=3, dilation=r,
                                       dtype=self.dtype,
                                       name=f"branch{i + 1}")(x, train=train))
        # image pooling branch: GAP -> 1x1 conv -> ReLU (no BN), broadcast back
        # (reference modules/panoptic_deeplab.py:80-98; set_image_pooling is
        # never called on the main path so this is always a true GAP)
        pool = jnp.mean(x, axis=(1, 2), keepdims=True)
        pool = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype,
                       name="pool_conv")(pool)
        pool = nn.relu(pool)
        branches.append(jnp.broadcast_to(pool, branches[0].shape))

        y = jnp.concatenate(branches, axis=-1)
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project_conv")(y)
        y = _bn_relu(self.out_channels, "project_bn")(y, train=train)
        y = nn.Dropout(0.5, deterministic=not train, name="project_drop")(y)
        return y


class PanopticDecoder(nn.Module):
    """Top-down decoder: ASPP(res5) then fuse res4, res3, res2."""

    decoder_channels: int = 128
    aspp_channels: int = 256
    low_level_project: Sequence[int] = (64, 32, 16)
    atrous_rates: Sequence[int] = (3, 6, 9)
    dtype: Any = None

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray], train: bool = False) -> jnp.ndarray:
        x = ASPP(out_channels=self.aspp_channels, atrous_rates=tuple(self.atrous_rates),
                 dtype=self.dtype, name="aspp")(features["res5"], train=train)
        for i, key in enumerate(["res4", "res3", "res2"]):
            low = ConvBNReLU(self.low_level_project[i], kernel=1, dtype=self.dtype,
                             name=f"project_{i}")(features[key], train=train)
            x = resize_bilinear(x, low.shape[1:3], align_corners=True)
            x = jnp.concatenate([x, low], axis=-1)
            x = DepthwiseSeparableConv(self.decoder_channels, dtype=self.dtype,
                                       name=f"fuse_{i}")(x, train=train)
        return x


class IncrementalInstanceHead(nn.Module):
    """Center + offset head with per-step center classifiers.

    `center_classes` is the per-step thing-class counts (step 0 excludes
    background: classes[0]-1, reference ``segmentation_module.py:329-338``).
    """

    center_classes: Sequence[int]
    center_channels: int = 128
    offset_channels: int = 32
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        c = DepthwiseSeparableConv(self.center_channels, dtype=self.dtype,
                                   name="center_fuse")(x, train=train)
        centers = [
            nn.Conv(n, (1, 1), dtype=self.dtype, name=f"center_cls_{i}")(c)
            for i, n in enumerate(self.center_classes)
        ]
        o = DepthwiseSeparableConv(self.offset_channels, dtype=self.dtype,
                                   name="offset_fuse")(x, train=train)
        offset = nn.Conv(2, (1, 1), dtype=self.dtype, name="offset_cls_0")(o)
        return {"center": jnp.concatenate(centers, axis=-1), "offset": offset}
