"""ABN: fused (sync) batch-norm + activation, the TPU replacement for InPlace-ABN.

The reference leans on the inplace_abn CUDA extension for every norm layer
(reference ``segmentation_module.py:17-29``): a fused BN + leaky-ReLU whose
batch statistics all-reduce across GPUs (`InPlaceABNSync`). On TPU the
design is different and simpler:

* Under ``jit`` with a batch sharded over the ``data`` mesh axis, reductions
  over the batch axis are *global* reductions — XLA inserts the cross-chip
  collectives automatically. Plain "compute stats over (N, H, W)" on the
  global array IS sync-BN; no per-layer backend calls.
* The memory savings of *in-place* ABN come for free from XLA fusion +
  rematerialization (`jax.checkpoint` on the backbone blocks); there is no
  manual buffer reuse to write.
* An optional fused Pallas kernel (``cl4wsis_tpu.core.pallas_abn``) covers the
  normalize+activate elementwise pass for peak HBM-bandwidth efficiency.

Layout is NHWC (TPU-native), stats are computed in float32 regardless of the
compute dtype. Running stats follow the torch convention used by the iABN
pretrained checkpoints so they convert 1:1
(``segmentation_module.py:37-57``): ``running = (1 - m) * running + m * batch``
with torch momentum m = 0.1 (i.e. flax-style decay 0.9), unbiased variance in
the running buffer, biased variance for normalization, eps 1e-5.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def _activate(x: jnp.ndarray, activation: str, param: float) -> jnp.ndarray:
    if activation == "leaky_relu":
        return nn.leaky_relu(x, negative_slope=param)
    if activation == "elu":
        return nn.elu(x, alpha=param)
    if activation == "identity":
        return x
    if activation == "relu":
        return nn.relu(x)
    raise ValueError(f"unknown activation {activation!r}")


class ABN(nn.Module):
    """Batch norm + activation over NHWC input.

    Attributes:
      features: number of channels C.
      momentum: decay of the running stats (flax convention; 0.9 == torch 0.1).
      activation: 'leaky_relu' | 'elu' | 'identity' | 'relu'.
      activation_param: negative_slope / alpha.
      dtype: compute dtype of the output (params & stats stay float32).
      sync_axis: optional named axis for explicit pmean sync when running
        under shard_map/pmap. Under plain jit+NamedSharding leave None —
        global-array reductions already sync across devices.
    """

    features: int
    eps: float = 1e-5
    momentum: float = 0.9
    activation: str = "leaky_relu"
    activation_param: float = 0.01
    dtype: Optional[jnp.dtype] = None
    sync_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        assert x.shape[-1] == self.features, (x.shape, self.features)
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,), jnp.float32))

        if train:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=axes)
            mean2 = jnp.mean(jnp.square(xf), axis=axes)
            if self.sync_axis is not None:
                mean = jax.lax.pmean(mean, self.sync_axis)
                mean2 = jax.lax.pmean(mean2, self.sync_axis)
            var = mean2 - jnp.square(mean)
            # count of elements per channel in the *global* batch
            n = 1
            for a in axes:
                n *= x.shape[a]
            if self.sync_axis is not None:
                n = n * jax.lax.psum(1, self.sync_axis)
            unbiased = var * (n / max(n - 1, 1))
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * unbiased
        else:
            mean = ra_mean.value
            var = ra_var.value

        dtype = self.dtype or x.dtype
        inv = jax.lax.rsqrt(var + self.eps) * scale
        slope = {"leaky_relu": self.activation_param, "identity": 1.0,
                 "relu": 0.0}.get(self.activation)
        from cl4wsis_tpu.core import pallas_abn
        if slope is not None and pallas_abn._on_tpu():
            # fused normalize+activate Pallas kernel (opt-in; see pallas_abn).
            # When off, the plain jnp path below keeps ordinary autodiff so
            # XLA fuses the affine into conv epilogues.
            shift = bias - mean * inv
            return pallas_abn.fused_affine_act(x, inv, shift, slope).astype(dtype)
        y = (x.astype(jnp.float32) - mean) * inv + bias
        return _activate(y, self.activation, self.activation_param).astype(dtype)
