"""Shared flax.linen building blocks with PyTorch-compatible semantics.

These are the primitives every model family in the framework is built
from. Layouts are NHWC (TPU-native: the channel dim lands on the 128
lane dimension), convs run on the MXU, and each block takes a ``dtype``
so inference paths can run bf16 with f32 params.

Semantics matched to the reference's torch modules:
  * ``PReLU``: per-channel negative slope (torch nn.PReLU(C)).
  * ``max_pool_ceil``: torch MaxPool2d(..., ceil_mode=True) — used by the
    MTCNN nets (/root/reference/models/mtcnn.py:21,64,67,114).
  * ``BasicConv2d``: Conv(bias=False) + BatchNorm(eps=1e-3) + ReLU
    (/root/reference/models/inception_resnet_v1.py:12-33).
"""

from typing import Any, Optional, Tuple, Union

import jax.numpy as jnp
import flax.linen as nn


def coerce_dtype(d):
    """JSON configs name dtypes as strings ("bfloat16"); accept those
    alongside real jnp dtypes (None passes through). The single
    implementation of the config contract — constructors and builders
    all route through here."""
    if d is None or not isinstance(d, str):
        return d
    return jnp.dtype(d).type


Dtype = Any


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


class PReLU(nn.Module):
    """Per-channel parametric ReLU (param name ``alpha``, shape [C])."""

    features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        alpha = self.param(
            "alpha", lambda key, shape: jnp.full(shape, 0.25, jnp.float32),
            (self.features,)
        )
        alpha = alpha.astype(x.dtype)
        return jnp.where(x >= 0, x, alpha * x)


def max_pool_ceil(x, window: int, stride: int, ceil_mode: bool = True):
    """Max pool over NHWC with torch's ceil_mode padding semantics.

    torch pads implicitly on the bottom/right just enough that the last
    (partial) window is included, but never starts a window inside the
    padding. Padding value is -inf so it never wins the max.
    """
    h, w = x.shape[1], x.shape[2]

    def pad_for(size):
        if ceil_mode:
            out = -(-(size - window) // stride) + 1
            # torch: last window must start inside the input
            if (out - 1) * stride >= size:
                out -= 1
        else:
            out = (size - window) // stride + 1
        pad = max((out - 1) * stride + window - size, 0)
        return pad

    pad_h, pad_w = pad_for(h), pad_for(w)
    return nn.max_pool(
        x,
        window_shape=(window, window),
        strides=(stride, stride),
        padding=((0, pad_h), (0, pad_w)),
    )


def conv2d(features, kernel_size, stride=1, padding=0, use_bias=True,
           groups=1, dtype=None, name=None):
    """torch-style Conv2d on NHWC: integer pixel padding, named exactly
    like the torch attribute so checkpoints map 1:1."""
    kh, kw = _pair(kernel_size)
    ph, pw = _pair(padding)
    return nn.Conv(
        features=features,
        kernel_size=(kh, kw),
        strides=_pair(stride),
        padding=((ph, ph), (pw, pw)),
        use_bias=use_bias,
        feature_group_count=groups,
        dtype=dtype,
        name=name,
    )


def batch_norm(eps=1e-5, momentum=0.1, train=False, dtype=None, name=None):
    """torch-convention BatchNorm (momentum is torch's, i.e. new-stat
    fraction)."""
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=1.0 - momentum,
        epsilon=eps,
        dtype=dtype,
        name=name,
    )


class BasicConv2d(nn.Module):
    """Conv(bias=False) + BN(eps=1e-3) + ReLU (inception_resnet_v1.py:12-33)."""

    features: int
    kernel_size: Union[int, Tuple[int, int]]
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kh, kw = _pair(self.kernel_size)
        ph, pw = _pair(self.padding)
        x = nn.Conv(
            self.features,
            (kh, kw),
            strides=_pair(self.stride),
            padding=((ph, ph), (pw, pw)),
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-3,
            dtype=self.dtype,
            name="bn",
        )(x)
        return nn.relu(x)


def adaptive_avg_pool(x, output_size: int = 1):
    """NHWC adaptive average pool to (output_size, output_size)."""
    if output_size == 1:
        return jnp.mean(x, axis=(1, 2), keepdims=True)
    from ..ops.image import area_resize

    return area_resize(x, (output_size, output_size))
