"""ResNet backbones (50/101) in flax, NHWC, with dilated output-stride 8/16.

Re-design of the reference backbone (``models/resnet.py:11-138``,
``modules/residual.py:7-98``): post-activation bottleneck blocks whose last
norm has identity activation, residual add, then leaky-ReLU; every norm is
the fused (sync) ABN. `keep_outputs` semantics are preserved by always
returning all five stage outputs (res1..res5) — XLA dead-code-eliminates
unused ones, so there is no cost when a caller only needs res5.

Stage geometry (output_stride 16): res1 /4 (64ch), res2 /4 (256),
res3 /8 (512), res4 /16 (1024), res5 /16 dil2 (2048).
Output stride 8 moves the stride-2 out of res4/res5 into dilation 2/4.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

from cl4wsis_tpu.core.abn import ABN

ModuleDef = Any


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride, dilation) -> 1x1 bottleneck with fused-ABN norms."""

    channels: Sequence[int]  # (c0, c1, c2)
    stride: int = 1
    dilation: int = 1
    norm: Callable[..., nn.Module] = ABN
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c0, c1, c2 = self.channels
        conv = lambda f, k, s, d, name: nn.Conv(  # noqa: E731
            f, (k, k), strides=(s, s), kernel_dilation=(d, d),
            padding=[(d * (k - 1) // 2,) * 2] * 2, use_bias=False,
            dtype=self.dtype, name=name)

        y = conv(c0, 1, 1, 1, "conv1")(x)
        y = self.norm(features=c0, name="bn1")(y, train=train)
        y = conv(c1, 3, self.stride, self.dilation, "conv2")(y)
        y = self.norm(features=c1, name="bn2")(y, train=train)
        y = conv(c2, 1, 1, 1, "conv3")(y)
        y = self.norm(features=c2, activation="identity", name="bn3")(y, train=train)

        if self.stride != 1 or x.shape[-1] != c2:
            sc = conv(c2, 1, self.stride, 1, "proj_conv")(x)
            sc = self.norm(features=c2, activation="identity", name="proj_bn")(sc, train=train)
        else:
            sc = x
        return nn.leaky_relu(y + sc, negative_slope=0.01)


class ResNet(nn.Module):
    """ResNet body returning dict(res1..res5)."""

    structure: Sequence[int] = (3, 4, 23, 3)  # resnet101
    bottleneck: bool = True
    output_stride: int = 16
    norm: Callable[..., nn.Module] = ABN
    dtype: Any = None
    # rematerialize each residual block's activations in backward (trades
    # FLOPs for HBM; lets batch 16 @ 512^2 train within a v5e's 16GB)
    remat: bool = False

    @property
    def out_channels(self) -> int:
        return 2048 if self.bottleneck else 512

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        if self.output_stride == 16:
            dilation = [1, 1, 1, 2]
        elif self.output_stride == 8:
            dilation = [1, 1, 2, 4]
        else:
            raise ValueError("output_stride must be 8 or 16")

        y = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="mod1_conv1")(x)
        y = self.norm(features=64, name="mod1_bn1")(y, train=train)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        outs = {"res1": y}
        channels = [64, 64, 256] if self.bottleneck else [64, 64]
        block_cls = Bottleneck if self.bottleneck else BasicBlock
        if self.remat:
            block_cls = nn.remat(block_cls, static_argnums=(2,))
        for mod_id, num in enumerate(self.structure):
            d = dilation[mod_id]
            for block_id in range(num):
                stride = 2 if d == 1 and block_id == 0 and mod_id > 0 else 1
                y = block_cls(channels=tuple(channels), stride=stride, dilation=d,
                              norm=self.norm, dtype=self.dtype,
                              name=f"mod{mod_id + 2}_block{block_id + 1}")(y, train)
            outs[f"res{mod_id + 2}"] = y
            channels = [c * 2 for c in channels]
        return outs


def resnet50(**kw) -> ResNet:
    return ResNet(structure=(3, 4, 6, 3), **kw)


def resnet101(**kw) -> ResNet:
    return ResNet(structure=(3, 4, 23, 3), **kw)


class BasicBlock(nn.Module):
    """Two 3x3 convs (ResNet-18/34 style, reference modules/residual.py:50-62)."""

    channels: Sequence[int]  # (c0, c1)
    stride: int = 1
    dilation: int = 1
    norm: Callable[..., nn.Module] = ABN
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c0, c1 = self.channels
        conv = lambda f, k, s, d, name: nn.Conv(  # noqa: E731
            f, (k, k), strides=(s, s), kernel_dilation=(d, d),
            padding=[(d * (k - 1) // 2,) * 2] * 2, use_bias=False,
            dtype=self.dtype, name=name)
        y = conv(c0, 3, self.stride, self.dilation, "conv1")(x)
        y = self.norm(features=c0, name="bn1")(y, train=train)
        y = conv(c1, 3, 1, self.dilation, "conv2")(y)
        y = self.norm(features=c1, activation="identity", name="bn2")(y, train=train)
        if self.stride != 1 or x.shape[-1] != c1:
            sc = conv(c1, 1, self.stride, 1, "proj_conv")(x)
            sc = self.norm(features=c1, activation="identity", name="proj_bn")(sc, train=train)
        else:
            sc = x
        return nn.leaky_relu(y + sc, negative_slope=0.01)


def resnet18(**kw) -> ResNet:
    return ResNet(structure=(2, 2, 2, 2), bottleneck=False, **kw)


def resnet34(**kw) -> ResNet:
    return ResNet(structure=(3, 4, 6, 3), bottleneck=False, **kw)


def resnet152(**kw) -> ResNet:
    return ResNet(structure=(3, 8, 36, 3), **kw)
