"""Shared torchvision-style ResNet trunk (Bottleneck blocks), NHWC.

One implementation serves both consumers in the reference:
  * the 2-branch emotion ResNet-50 (/root/reference/models/
    resnet_2_branch_utils/resnet.py:70-160),
  * the RetinaFace ResNet-50 backbone pulled from torchvision
    (/root/reference/models/retina_face.py:86-90), which taps
    layer2/layer3/layer4 via IntermediateLayerGetter.

Module names mirror torch (conv1/bn1/layer{1..4}/<i>/conv{1..3},
downsample/0, downsample/1) so ImageNet / emotion checkpoints convert
directly.
"""

from typing import Any, Tuple

import flax.linen as nn


def _bn(name, train, dtype=None):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, name=name)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    expansion: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        residual = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=dt,
                      name="conv1")(x)
        out = _bn("bn1", train, dt)(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                      padding=((1, 1), (1, 1)), use_bias=False, dtype=dt,
                      name="conv2")(out)
        out = _bn("bn2", train, dt)(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                      dtype=dt, name="conv3")(out)
        out = _bn("bn3", train, dt)(out)
        if self.has_downsample:
            residual = BottleneckDownsample(
                self.planes * self.expansion, self.stride, dtype=dt,
                name="downsample"
            )(x, train)
        return nn.relu(out + residual)


class BottleneckDownsample(nn.Module):
    features: int
    stride: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (1, 1), strides=(self.stride,) * 2,
                    use_bias=False, dtype=self.dtype, name="0")(x)
        return _bn("1", train, self.dtype)(x)


class ResLayer(nn.Module):
    planes: int
    blocks: int
    stride: int
    inplanes: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        needs_ds = self.stride != 1 or self.inplanes != self.planes * 4
        x = Bottleneck(self.planes, self.stride, needs_ds,
                       dtype=self.dtype, name="0")(x, train)
        for i in range(1, self.blocks):
            x = Bottleneck(self.planes, 1, False, dtype=self.dtype,
                           name=str(i))(x, train)
        return x


class ResNetTrunk(nn.Module):
    """conv1 -> bn1 -> relu -> maxpool -> layer1..layer4; returns the
    (layer1, layer2, layer3, layer4) feature maps."""

    layers: Tuple[int, int, int, int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, name="conv1")(x)
        x = _bn("bn1", train)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))
        c1 = ResLayer(64, self.layers[0], 1, 64, name="layer1")(x, train)
        c2 = ResLayer(128, self.layers[1], 2, 256, name="layer2")(c1, train)
        c3 = ResLayer(256, self.layers[2], 2, 512, name="layer3")(c2, train)
        c4 = ResLayer(512, self.layers[3], 2, 1024, name="layer4")(c3, train)
        return c1, c2, c3, c4
