"""The three helpers `models/vitpose/vitpose.py:10` imports from timm.

Standard utilities re-implemented from their public definitions:
stochastic depth, int->2-tuple, truncated-normal init.
"""

import collections.abc
import math

import torch


def drop_path(x, drop_prob: float = 0.0, training: bool = False):
    if drop_prob == 0.0 or not training:
        return x
    keep_prob = 1 - drop_prob
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    random_tensor = keep_prob + torch.rand(shape, dtype=x.dtype,
                                           device=x.device)
    random_tensor.floor_()
    return x.div(keep_prob) * random_tensor


def to_2tuple(x):
    if isinstance(x, collections.abc.Iterable) and not isinstance(x, str):
        return tuple(x)
    return (x, x)


def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
    # inverse-CDF truncated normal (same scheme as timm/torch.nn.init)
    def norm_cdf(v):
        return (1.0 + math.erf(v / math.sqrt(2.0))) / 2.0

    with torch.no_grad():
        low = norm_cdf((a - mean) / std)
        up = norm_cdf((b - mean) / std)
        tensor.uniform_(2 * low - 1, 2 * up - 1)
        tensor.erfinv_()
        tensor.mul_(std * math.sqrt(2.0))
        tensor.add_(mean)
        tensor.clamp_(min=a * std + mean, max=b * std + mean)
        return tensor
