"""iresnet (ArcFace / insightface) 112x112 -> 512-d embedding encoder.

Same topology as the reference (/root/reference/models/
iresnet_encoder.py:26-196): IBasicBlock = BN-Conv-BN-PReLU-Conv(stride)
-BN residual with 1x1-conv downsample, depths 34/50/100, BN eps 2e-5,
``fc_scale``=7*7 flatten with NO pooling before the fc, then a final
BatchNorm1d ``features`` (and an optional ``logits`` log_softmax head
with freeze-weights support, handled by the trainer's frozen-encoder
path rather than per-parameter requires_grad).

NHWC; the flatten transposes back to channel-major order so the
published torch fc weights apply unchanged.
"""

import os
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .layers import PReLU


_DEPTH_LAYERS = {34: (3, 4, 6, 3), 50: (3, 4, 14, 3), 100: (3, 13, 30, 3)}
_BN_EPS = 2e-5
_BN_MOMENTUM = 0.9  # torch momentum convention


def _bn(name, train, dtype=None):
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=1.0 - _BN_MOMENTUM,
        epsilon=_BN_EPS,
        dtype=dtype,
        name=name,
    )


class IBasicBlock(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        identity = x
        out = _bn("bn1", train, dt)(x)
        out = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False, dtype=dt, name="conv1")(out)
        out = _bn("bn2", train, dt)(out)
        out = PReLU(self.planes, name="prelu")(out)
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                      padding=((1, 1), (1, 1)), use_bias=False,
                      dtype=dt, name="conv2")(out)
        out = _bn("bn3", train, dt)(out)
        if self.has_downsample:
            identity = Downsample(self.planes, self.stride, dtype=dt,
                                  name="downsample")(x, train)
        return out + identity


class Downsample(nn.Module):
    planes: int
    stride: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.planes, (1, 1), strides=(self.stride,) * 2,
                    use_bias=False, dtype=self.dtype, name="0")(x)
        return _bn("1", train, self.dtype)(x)


class Layer(nn.Module):
    planes: int
    blocks: int
    stride: int
    inplanes: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        needs_ds = self.stride != 1 or self.inplanes != self.planes
        x = IBasicBlock(self.planes, self.stride, needs_ds,
                        dtype=self.dtype, name="0")(x, train)
        for i in range(1, self.blocks):
            x = IBasicBlock(self.planes, 1, False, dtype=self.dtype,
                            name=str(i))(x, train)
        return x


class IResNet(nn.Module):
    layers: Tuple[int, int, int, int]
    num_features: int = 512
    n_classes: Optional[int] = None
    dropout: float = 0.4
    fc_scale: int = 7 * 7
    # flax compute dtype: bf16 runs the trunk on the MXU in bf16 with
    # f32 params; the fc/features head and logits stay f32 (embedding
    # contract cosine >= 0.999)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        x = nn.Conv(64, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=dt, name="conv1")(x)
        x = _bn("bn1", train, dt)(x)
        x = PReLU(64, name="prelu")(x)
        x = Layer(64, self.layers[0], 2, 64, dtype=dt,
                  name="layer1")(x, train)
        x = Layer(128, self.layers[1], 2, 64, dtype=dt,
                  name="layer2")(x, train)
        x = Layer(256, self.layers[2], 2, 128, dtype=dt,
                  name="layer3")(x, train)
        x = Layer(512, self.layers[3], 2, 256, dtype=dt,
                  name="layer4")(x, train)
        x = _bn("bn2", train, dt)(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        # channel-major flatten for torch fc weight parity
        n = x.shape[0]
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(n, -1)
        x = x.astype(jnp.float32)
        x = nn.Dense(self.num_features, name="fc")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=1.0 - _BN_MOMENTUM,
            epsilon=_BN_EPS, name="features",
        )(x)
        if self.n_classes is not None:
            x = nn.Dense(self.n_classes, name="logits")(x)
            x = nn.log_softmax(x, axis=-1)
        return x


def iresnet34(**kwargs):
    return IResNet(layers=_DEPTH_LAYERS[34], **kwargs)


def iresnet50(**kwargs):
    return IResNet(layers=_DEPTH_LAYERS[50], **kwargs)


def iresnet100(**kwargs):
    return IResNet(layers=_DEPTH_LAYERS[100], **kwargs)


def _weight_candidates(depth):
    stem = f"iresnet{depth}"
    here = os.path.join(os.path.dirname(__file__), "weights")
    torch_home = os.path.expanduser(
        os.getenv("TORCH_HOME",
                  os.path.join(os.getenv("XDG_CACHE_HOME", "~/.cache"),
                               "torch"))
    )
    return [
        os.path.join(here, stem + ".npz"),
        os.path.join(torch_home, "checkpoints", stem + ".npz"),
    ]


def build_iresnet(depth, pretrained=False, progress=True,
                  checkpoint_path="", freeze_weights=False, n_classes=None,
                  num_features=512, weights_path=None, dtype=None):
    """Factory mirroring the reference _iresnet semantics
    (iresnet_encoder.py:162-181). ``freeze_weights`` is recorded but
    enforcement happens in the trainer (frozen-encoder path)."""
    from .torch_convert import convert_state_dict, load_torch_checkpoint

    model = IResNet(layers=_DEPTH_LAYERS[depth], num_features=num_features,
                    n_classes=n_classes, dtype=dtype)
    variables = None
    if pretrained:
        candidates = [c for c in [weights_path, checkpoint_path or None]
                      if c]
        candidates += _weight_candidates(depth)
        for path in candidates:
            if path and os.path.exists(path):
                if path.endswith(".npz"):
                    loaded = np.load(path)
                    sd = {k: loaded[k] for k in loaded.files}
                else:
                    sd = load_torch_checkpoint(path)
                if n_classes is None:
                    sd = {k: v for k, v in sd.items()
                          if not k.startswith("logits.")}
                variables = convert_state_dict(sd)
                break
        if variables is None:
            print(
                f"Warning: pretrained iresnet{depth} requested but no "
                "local weights found; the encoder is randomly "
                "initialised. Convert the published torch checkpoint "
                "with tools/convert_weights.py."
            )
    return model, variables
