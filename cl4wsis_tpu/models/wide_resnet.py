"""WideResNet-38 A2 backbone (pre-activation identity blocks), NHWC flax.

Re-design of reference ``models/wide_resnet.py:83-224`` and
``modules/residual.py:101-182``. The A2 variant always runs in dilated
mode (output stride 8): /2 pools before mod2 and mod3, stride 2 at
mod4.block1, dilation 2 in mod5 and 4 in mod6/mod7; dropout 0.3 in mod6
and 0.5 in mod7 blocks.

`keep_outputs` low-level features are the *pre-activation bn1 outputs*
captured from the first block of mod4..mod7 (reference ``ret_prev``,
``modules/residual.py:169-182``):
  res1 = bn1(mod4.block1 in)  256ch /4      res2 = bn1(mod5...) 512ch /8
  res3 = bn1(mod6...) 1024ch /8             res4 = bn1(mod7...) 2048ch /8
  res5 = bn_out(mod7 out) 4096ch /8
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from cl4wsis_tpu.core.abn import ABN

_CHANNELS: Tuple[Tuple[int, ...], ...] = (
    (128, 128), (256, 256), (512, 512), (512, 1024),
    (512, 1024, 2048), (1024, 2048, 4096))


class IdentityResidualBlock(nn.Module):
    channels: Sequence[int]
    stride: int = 1
    dilation: int = 1
    dropout: Optional[float] = None
    norm: Callable[..., nn.Module] = ABN
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False, ret_prev: bool = False):
        cin = x.shape[-1]
        is_bottleneck = len(self.channels) == 3
        need_proj = self.stride != 1 or cin != self.channels[-1]

        conv = lambda f, k, s, d, name: nn.Conv(  # noqa: E731
            f, (k, k), strides=(s, s), kernel_dilation=(d, d),
            padding=[(d * (k - 1) // 2,) * 2] * 2, use_bias=False,
            dtype=self.dtype, name=name)

        bn1 = self.norm(features=cin, name="bn1")(x, train=train)
        shortcut = conv(self.channels[-1], 1, self.stride, 1, "proj_conv")(bn1) \
            if need_proj else x

        if not is_bottleneck:
            c0, c1 = self.channels
            y = conv(c0, 3, self.stride, self.dilation, "conv1")(bn1)
            y = self.norm(features=c0, name="bn2")(y, train=train)
            if self.dropout is not None:
                y = nn.Dropout(self.dropout, deterministic=not train,
                               name="drop")(y)
            y = conv(c1, 3, 1, self.dilation, "conv2")(y)
        else:
            c0, c1, c2 = self.channels
            y = conv(c0, 1, self.stride, 1, "conv1")(bn1)
            y = self.norm(features=c0, name="bn2")(y, train=train)
            y = conv(c1, 3, 1, self.dilation, "conv2")(y)
            y = self.norm(features=c1, name="bn3")(y, train=train)
            if self.dropout is not None:
                y = nn.Dropout(self.dropout, deterministic=not train,
                               name="drop")(y)
            y = conv(c2, 1, 1, 1, "conv3")(y)

        out = y + shortcut
        return (out, bn1) if ret_prev else out


class WiderResNet38A2(nn.Module):
    """Returns dict(res1..res5); see module docstring for the mapping."""

    structure: Sequence[int] = (3, 3, 6, 3, 1, 1)
    output_stride: int = 8  # the A2 variant is always dilated (OS8)
    norm: Callable[..., nn.Module] = ABN
    dtype: Any = None
    # rematerialize each block's activations in backward — the TPU-native
    # stand-in for the reference's inplace_abn memory rationale
    # (segmentation_module.py:5-6): WRN-38 @ 448^2 batch 16 keeps ~16
    # full-width activation planes alive without it
    remat: bool = False

    @property
    def out_channels(self) -> int:
        return 4096

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        y = nn.Conv(64, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name="mod1_conv1")(x)

        block_cls = IdentityResidualBlock
        if self.remat:
            # static_argnums: (train, ret_prev) flags are python bools
            block_cls = nn.remat(block_cls, static_argnums=(2, 3))

        prevs = {}
        for mod_id, num in enumerate(self.structure):
            if mod_id < 2:
                y = nn.max_pool(y, (3, 3), strides=(2, 2),
                                padding=[(1, 1), (1, 1)])
            for block_id in range(num):
                dil = 2 if mod_id == 3 else (4 if mod_id > 3 else 1)
                stride = 2 if block_id == 0 and mod_id == 2 else 1
                drop = 0.3 if mod_id == 4 else (0.5 if mod_id == 5 else None)
                block = block_cls(
                    channels=_CHANNELS[mod_id], stride=stride, dilation=dil,
                    dropout=drop, norm=self.norm, dtype=self.dtype,
                    name=f"mod{mod_id + 2}_block{block_id + 1}")
                if mod_id >= 2 and block_id == 0:
                    y, prev = block(y, train, True)
                    prevs[f"mod{mod_id + 2}"] = prev
                else:
                    y = block(y, train, False)

        out7 = self.norm(features=self.out_channels, name="bn_out")(y, train=train)
        return {"res1": prevs["mod4"], "res2": prevs["mod5"],
                "res3": prevs["mod6"], "res4": prevs["mod7"], "res5": out7}


def wider_resnet16_a2(**kw) -> WiderResNet38A2:
    return WiderResNet38A2(structure=(1, 1, 1, 1, 1, 1), **kw)


def wider_resnet20_a2(**kw) -> WiderResNet38A2:
    return WiderResNet38A2(structure=(1, 1, 1, 3, 1, 1), **kw)


def wider_resnet38_a2(**kw) -> WiderResNet38A2:
    return WiderResNet38A2(structure=(3, 3, 6, 3, 1, 1), **kw)
