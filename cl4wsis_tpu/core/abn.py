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
* The normalize+activate elementwise pass stays plain jnp so XLA fuses it
  into conv epilogues (a dedicated Pallas kernel was A/B'd and deleted:
  ~2x slower as a fusion barrier — docs/verification.md round 4).

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
        # plain jnp on purpose: XLA fuses the affine+activation into the
        # producing conv's epilogue. A fused Pallas kernel for this pass
        # (core/pallas_abn.py, removed round 4) is a fusion BARRIER and
        # measured ~2x SLOWER end-to-end on the real chip (phase-1
        # 155.4 -> 82.5 img/s, step-0 similar; docs/verification.md).
        y = (x.astype(jnp.float32) - mean) * inv + bias
        return _activate(y, self.activation, self.activation_param).astype(dtype)
