"""Functional core of the inplace_abn shim.

``modules/custom_bn.py:216`` calls this positionally:
    inplace_abn(x, weight, bias, running_mean, running_var, training,
                momentum, eps, activation, activation_param)
"""

import torch.nn.functional as F


def inplace_abn(x, weight, bias, running_mean, running_var, training,
                momentum, eps, activation="leaky_relu",
                activation_param=0.01):
    x = F.batch_norm(x, running_mean, running_var, weight, bias,
                     training, momentum, eps)
    if activation == "leaky_relu":
        return F.leaky_relu(x, negative_slope=activation_param)
    if activation == "elu":
        return F.elu(x, alpha=activation_param)
    if activation in ("identity", "none", None):
        return x
    raise ValueError(f"unknown activation {activation!r}")


def inplace_abn_sync(x, weight, bias, running_mean, running_var, training,
                     momentum, eps, activation="leaky_relu",
                     activation_param=0.01, group=None):
    return inplace_abn(x, weight, bias, running_mean, running_var, training,
                       momentum, eps, activation, activation_param)
