"""SE-IR ResNet encoder + ArcMargin head (ArcFace-style alternative).

Reference: /root/reference/models/resnet_encoder.py — IRBlock
(BN-Conv-BN-PReLU-Conv-BN[-SE] residual with scalar PReLUs), optional
SEBlock, `resnet101` exported in the registry, and ArcMarginModel
implementing the additive-angular-margin cos(theta+m)*s head
(resnet_encoder.py:264-297). The reference never wires ArcMargin into a
trainer; it's provided here for the same completeness.
"""

import math
import os
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _bn(name, train):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, name=name)


class ScalarPReLU(nn.Module):
    """torch nn.PReLU() with a single shared slope parameter."""

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha",
                           lambda key, shape: jnp.full(shape, 0.25), (1,))
        return jnp.where(x >= 0, x, alpha * x)


class SEFc(nn.Module):
    """SE excitation MLP with torch Sequential child names 0/1/2/3."""

    channel: int
    reduction: int = 16

    @nn.compact
    def __call__(self, y):
        y = nn.Dense(self.channel // self.reduction, name="0")(y)
        y = ScalarPReLU(name="1")(y)
        y = nn.Dense(self.channel, name="2")(y)
        return nn.sigmoid(y)


class SE(nn.Module):
    channel: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x, axis=(1, 2))
        y = SEFc(self.channel, self.reduction, name="fc")(y)
        return x * y[:, None, None, :]


class IRBlock(nn.Module):
    inplanes: int
    planes: int
    stride: int = 1
    has_downsample: bool = False
    use_se: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        # the reference applies the SAME prelu parameters twice
        # (resnet_encoder.py:138,149); sharing the module instance
        # reproduces that.
        prelu = ScalarPReLU(name="prelu")
        out = _bn("bn0", train)(x)
        out = nn.Conv(self.inplanes, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False, name="conv1")(out)
        out = _bn("bn1", train)(out)
        out = prelu(out)
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                      padding=((1, 1), (1, 1)), use_bias=False,
                      name="conv2")(out)
        out = _bn("bn2", train)(out)
        if self.use_se:
            out = SE(self.planes, name="se")(out)
        if self.has_downsample:
            residual = IRDownsample(self.planes, self.stride,
                                    name="downsample")(x, train)
        return prelu(out + residual)


class IRDownsample(nn.Module):
    features: int
    stride: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (1, 1), strides=(self.stride,) * 2,
                    use_bias=False, name="0")(x)
        return _bn("1", train)(x)


class IRLayer(nn.Module):
    planes: int
    blocks: int
    stride: int
    inplanes: int
    use_se: bool

    @nn.compact
    def __call__(self, x, train: bool = False):
        needs_ds = self.stride != 1 or self.inplanes != self.planes
        x = IRBlock(self.inplanes, self.planes, self.stride, needs_ds,
                    self.use_se, name="0")(x, train)
        for i in range(1, self.blocks):
            x = IRBlock(self.planes, self.planes, 1, False, self.use_se,
                        name=str(i))(x, train)
        return x


class ResNetSE(nn.Module):
    layers: Tuple[int, int, int, int] = (3, 4, 23, 3)
    use_se: bool = True
    im_size: int = 112

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (3, 3), use_bias=False, padding="VALID",
                    name="conv1")(x)
        x = _bn("bn1", train)(x)
        x = ScalarPReLU(name="prelu")(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = IRLayer(64, self.layers[0], 1, 64, self.use_se,
                    name="layer1")(x, train)
        x = IRLayer(128, self.layers[1], 2, 64, self.use_se,
                    name="layer2")(x, train)
        x = IRLayer(256, self.layers[2], 2, 128, self.use_se,
                    name="layer3")(x, train)
        x = IRLayer(512, self.layers[3], 2, 256, self.use_se,
                    name="layer4")(x, train)
        x = _bn("bn2", train)(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        n = x.shape[0]
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(n, -1)
        x = nn.Dense(512, name="fc")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn3")(x)
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True).clip(1e-12)


def resnet101(use_se=True, pretrained=False, img_size=112, cp_path=None):
    return ResNetSE(layers=(3, 4, 23, 3), use_se=use_se, im_size=img_size)


def build_resnet_se(use_se=True, pretrained=False, img_size=112,
                    cp_path=None, weights_path=None):
    """Factory for the registry name 'resnet101'."""
    import numpy as np

    from .torch_convert import convert_state_dict, load_torch_checkpoint

    model = resnet101(use_se=use_se, img_size=img_size)
    variables = None
    for path in [weights_path, cp_path]:
        if path and os.path.exists(path):
            if path.endswith(".npz"):
                loaded = np.load(path)
                sd = {k: loaded[k] for k in loaded.files}
            else:
                sd = load_torch_checkpoint(path)
            variables = convert_state_dict(sd)
            break
    return model, variables


class ArcMarginModel(nn.Module):
    """Additive angular margin head: s * cos(theta + m) on the target
    class (resnet_encoder.py:264-297). Pure function of (embeddings,
    labels); weight matrix is the only parameter."""

    num_classes: int
    emb_size: int = 512
    margin_m: float = 0.5
    margin_s: float = 64.0
    easy_margin: bool = False

    @nn.compact
    def __call__(self, x, label):
        weight = self.param(
            "weight", nn.initializers.xavier_uniform(),
            (self.num_classes, self.emb_size),
        )
        x = x / jnp.linalg.norm(x, axis=-1, keepdims=True).clip(1e-12)
        w = weight / jnp.linalg.norm(weight, axis=-1, keepdims=True).clip(
            1e-12)
        cosine = x @ w.T
        sine = jnp.sqrt(jnp.clip(1.0 - cosine ** 2, 0.0, 1.0))
        cos_m = math.cos(self.margin_m)
        sin_m = math.sin(self.margin_m)
        th = math.cos(math.pi - self.margin_m)
        mm = math.sin(math.pi - self.margin_m) * self.margin_m
        phi = cosine * cos_m - sine * sin_m
        if self.easy_margin:
            phi = jnp.where(cosine > 0, phi, cosine)
        else:
            phi = jnp.where(cosine > th, phi, cosine - mm)
        one_hot = jax.nn.one_hot(label, self.num_classes, dtype=cosine.dtype)
        return (one_hot * phi + (1.0 - one_hot) * cosine) * self.margin_s
