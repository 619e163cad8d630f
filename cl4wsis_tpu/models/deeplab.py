"""DeepLab-v3 ASPP semantic head and the incremental 1x1 classifier.

Re-design of reference ``modules/deeplab.py:8-89`` and the per-step
classifier of ``segmentation_module.py:107-113``. Notable preserved
behaviors:

* atrous rates 6/12/18 at output-stride 16, 12/24/32 at OS 8;
* the train/eval pooling asymmetry: training uses a true global average
  broadcast, eval uses a sliding `pooling_size` average window with
  replicate padding (``modules/deeplab.py:65-89``) — `pooling_size` is
  crop_size // output_stride (``argparser.py:30``);
* per-step classifier convs whose outputs are concatenated along the channel
  axis, so old-step logits come from old-step parameters untouched.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from cl4wsis_tpu.core.abn import ABN

_XAVIER_LRELU_GAIN = (2.0 / (1.0 + 0.01 ** 2)) ** 0.5  # torch calculate_gain('leaky_relu', .01)


def _xavier_normal(gain: float):
    def init(key, shape, dtype=jnp.float32):
        # flax conv kernels are (kh, kw, cin, cout)
        fan_in = shape[0] * shape[1] * shape[2]
        fan_out = shape[0] * shape[1] * shape[3]
        std = gain * (2.0 / (fan_in + fan_out)) ** 0.5
        import jax
        return jax.random.normal(key, shape, dtype) * std
    return init


class DeepLabV3Head(nn.Module):
    """ASPP head: 4 parallel atrous convs + pooled branch -> out_channels."""

    in_channels: int
    out_channels: int = 256
    hidden_channels: int = 256
    out_stride: int = 16
    pooling_size: Optional[int] = None
    norm: Callable[..., nn.Module] = ABN
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dil = [6, 12, 18] if self.out_stride == 16 else [12, 24, 32]
        kinit = _xavier_normal(_XAVIER_LRELU_GAIN)
        conv = lambda f, k, d, name: nn.Conv(  # noqa: E731
            f, (k, k), kernel_dilation=(d, d), padding=[(d * (k - 1) // 2,) * 2] * 2,
            use_bias=False, dtype=self.dtype, kernel_init=kinit, name=name)

        maps = [
            conv(self.hidden_channels, 1, 1, "map_conv0")(x),
            conv(self.hidden_channels, 3, dil[0], "map_conv1")(x),
            conv(self.hidden_channels, 3, dil[1], "map_conv2")(x),
            conv(self.hidden_channels, 3, dil[2], "map_conv3")(x),
        ]
        out = jnp.concatenate(maps, axis=-1)
        out = self.norm(features=self.hidden_channels * 4, name="map_bn")(out, train=train)
        out = conv(self.out_channels, 1, 1, "red_conv")(out)

        pool = self._pool(x, train)
        pool = conv(self.hidden_channels, 1, 1, "global_pooling_conv")(pool)
        pool = self.norm(features=self.hidden_channels,
                         name="global_pooling_bn")(pool, train=train)
        pool = conv(self.out_channels, 1, 1, "pool_red_conv")(pool)
        # GAP branch is (B,1,1,C): broadcast add. Windowed branch is (B,H,W,C).
        out = out + pool
        return self.norm(features=self.out_channels, name="red_bn")(out, train=train)

    def _pool(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        if train or self.pooling_size is None:
            return jnp.mean(x, axis=(1, 2), keepdims=True)
        H, W = x.shape[1:3]
        kh, kw = min(self.pooling_size, H), min(self.pooling_size, W)
        pool = nn.avg_pool(x, (kh, kw), strides=(1, 1))
        # replicate-pad back to HxW; extra pixel goes after for even windows
        # (reference modules/deeplab.py:80-88)
        pt, pb = (kh - 1) // 2, (kh - 1) // 2 + (0 if kh % 2 == 1 else 1)
        pl_, pr = (kw - 1) // 2, (kw - 1) // 2 + (0 if kw % 2 == 1 else 1)
        return jnp.pad(pool, ((0, 0), (pt, pb), (pl_, pr), (0, 0)), mode="edge")


class IncrementalClassifier(nn.Module):
    """Per-step 1x1 conv classifiers, outputs concatenated along channels.

    `classes` is [n_classes_step0, n_classes_step1, ...]; step 0 includes
    background. Old steps' logits depend only on old steps' parameters,
    which is what makes checkpoint expansion across CL steps trivial.
    """

    classes: Sequence[int]
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        outs = [
            nn.Conv(c, (1, 1), dtype=self.dtype, name=f"cls_{i}")(x)
            for i, c in enumerate(self.classes)
        ]
        return jnp.concatenate(outs, axis=-1)
