"""Pure-torch stand-in for the ``inplace_abn`` CUDA extension.

Covers exactly what the reference imports (``segmentation_module.py:5-6``,
``modules/custom_bn.py:4``): ``ABN``, ``InPlaceABN``, ``InPlaceABNSync`` and
``functions.inplace_abn``. Numerics follow torch BatchNorm conventions
(biased batch variance for normalization, unbiased for the running stats) —
the same conventions the real library implements; the in-place memory trick
is a CUDA-only optimization with no numerical effect, and with world size 1
the "Sync" variant is plain batch norm.

This shim exists so the reference can run END-TO-END on this CPU-only host
for trajectory-parity checks against the rebuild (VERDICT r2 item 4). It is
original code, not derived from the inplace_abn sources.
"""

import torch
import torch.nn as nn

from . import functions


class ABN(nn.Module):
    """BatchNorm2d + activation in one module (inplace_abn.ABN surface)."""

    def __init__(self, num_features, eps=1e-5, momentum=0.1, affine=True,
                 activation="leaky_relu", activation_param=0.01, **_ignored):
        super().__init__()
        self.num_features = num_features
        self.eps = eps
        self.momentum = momentum
        self.affine = affine
        self.activation = activation
        self.activation_param = activation_param
        if affine:
            self.weight = nn.Parameter(torch.ones(num_features))
            self.bias = nn.Parameter(torch.zeros(num_features))
        else:
            self.register_parameter("weight", None)
            self.register_parameter("bias", None)
        self.register_buffer("running_mean", torch.zeros(num_features))
        self.register_buffer("running_var", torch.ones(num_features))

    def reset_parameters(self):
        self.running_mean.zero_()
        self.running_var.fill_(1.0)
        if self.affine:
            nn.init.ones_(self.weight)
            nn.init.zeros_(self.bias)

    def forward(self, x):
        return functions.inplace_abn(
            x, self.weight, self.bias, self.running_mean, self.running_var,
            self.training, self.momentum, self.eps, self.activation,
            self.activation_param)

    def extra_repr(self):
        return (f"{self.num_features}, eps={self.eps}, "
                f"momentum={self.momentum}, affine={self.affine}, "
                f"activation={self.activation}[{self.activation_param}]")


class InPlaceABN(ABN):
    """Same numerics as ABN; the in-place trick is moot off-GPU."""


class InPlaceABNSync(ABN):
    """Cross-process sync BN; with world_size==1 it IS batch norm."""

    def __init__(self, *args, group=None, **kwargs):
        kwargs.pop("group", None)
        super().__init__(*args, **kwargs)
