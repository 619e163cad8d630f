"""Alternative normalization layers selectable via --norm_act.

Re-design of reference ``modules/custom_bn.py``:
* AIN — activated instance norm (``:8-101``): per-sample spatial stats in
  train mode, tracked per-channel running stats for eval.
* ABR — activated batch renormalization (``:104-195``): train-mode scale/
  shift corrected by stop-gradient (r, d) factors toward the running stats
  (no clipping in the reference), note momentum defaults to 0.0 there —
  running stats frozen unless configured.

Both share ABN's NHWC layout, float32 stats, and activation set.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from cl4wsis_tpu.core.abn import _activate


class AIN(nn.Module):
    features: int
    eps: float = 1e-5
    momentum: float = 0.9  # flax decay convention (torch 0.1)
    activation: str = "leaky_relu"
    activation_param: float = 0.01
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,), jnp.float32))
        xf = x.astype(jnp.float32)
        if train:
            # per-instance spatial stats (N, 1, 1, C)
            mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
            var = jnp.var(xf, axis=(1, 2), keepdims=True)
            if not self.is_initializing():
                n = x.shape[1] * x.shape[2]
                unbias = n / max(n - 1, 1)
                ra_mean.value = (self.momentum * ra_mean.value +
                                 (1 - self.momentum) * jnp.mean(mean, axis=(0, 1, 2)))
                ra_var.value = (self.momentum * ra_var.value +
                                (1 - self.momentum) * jnp.mean(var, axis=(0, 1, 2)) * unbias)
        else:
            mean = ra_mean.value
            var = ra_var.value
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return _activate(y, self.activation, self.activation_param).astype(
            self.dtype or x.dtype)


class ABR(nn.Module):
    features: int
    eps: float = 1e-5
    momentum: float = 1.0  # torch default momentum=0.0 -> frozen stats
    activation: str = "leaky_relu"
    activation_param: float = 0.01
    renorm: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,), jnp.float32))
        xf = x.astype(jnp.float32)
        axes = tuple(range(x.ndim - 1))
        if train:
            mean = jnp.mean(xf, axis=axes)
            var = jnp.var(xf, axis=axes)
            w, b = scale, bias
            if self.renorm:
                running_std = jnp.sqrt(ra_var.value + self.eps)
                # unbiased batch var like torch .var(dim=1) (modules/custom_bn.py:161)
                n = 1
                for a in axes:
                    n *= x.shape[a]
                var_unb = var * (n / max(n - 1, 1))
                r = jax.lax.stop_gradient(
                    jnp.sqrt(var_unb + self.eps) / running_std)
                d = jax.lax.stop_gradient(
                    (mean - ra_mean.value) / running_std)
                w = scale * r
                b = bias + scale * d
            if not self.is_initializing():
                n = 1
                for a in axes:
                    n *= x.shape[a]
                unb = n / max(n - 1, 1)
                ra_mean.value = (self.momentum * ra_mean.value +
                                 (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value +
                                (1 - self.momentum) * var * unb)
            y = (xf - mean) * jax.lax.rsqrt(var + self.eps) * w + b
        else:
            y = (xf - ra_mean.value) * jax.lax.rsqrt(ra_var.value + self.eps) \
                * scale + bias
        return _activate(y, self.activation, self.activation_param).astype(
            self.dtype or x.dtype)


def norm_factory(norm_act: str):
    """Map a --norm_act flag to a norm module class
    (reference ``segmentation_module.py:17-29``). iabn_sync and iabn both
    map to ABN (sync is implicit in global-array reductions); abr/iabr map
    to ABR; anything else is plain ABN too."""
    from cl4wsis_tpu.core.abn import ABN
    if norm_act in ("abr", "iabr"):
        return ABR
    if norm_act == "ain":
        return AIN
    return ABN
