"""InceptionResnetV1 (FaceNet) 512-d face embedding encoder.

Same topology/eps/scales as the reference torch model
(/root/reference/models/inception_resnet_v1.py:12-303): stem convs ->
5x Block35(0.17) -> Mixed_6a -> 10x Block17(0.10) -> Mixed_7a ->
5x Block8(0.20) -> Block8(noReLU) -> global avgpool -> dropout ->
Linear(1792->512, no bias) -> BatchNorm1d(eps 1e-3) -> L2-normalise
(or logits + log_softmax when ``classify``).

NHWC + bf16-capable; module names mirror the torch attribute names so
the published vggface2/casia-webface state_dicts convert 1:1 via
models/torch_convert (the reference downloads them at construction,
inception_resnet_v1.py:306-331 — here tools/convert_weights.py converts
a local copy once; there is no network access on the TPU hosts).
"""

import os
from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import BasicConv2d, max_pool_ceil


class Branch(nn.Module):
    """A chain of BasicConv2d blocks named '0', '1', ... (torch
    nn.Sequential naming)."""

    specs: Tuple[Tuple[int, Any, Any, Any], ...]  # (feat, kernel, stride, pad)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, (feat, kernel, stride, pad) in enumerate(self.specs):
            x = BasicConv2d(feat, kernel, stride, pad, dtype=self.dtype,
                            name=str(i))(x, train)
        return x


class Block35(nn.Module):
    scale: float = 1.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        x0 = BasicConv2d(32, 1, 1, 0, dtype=dt, name="branch0")(x, train)
        x1 = Branch(((32, 1, 1, 0), (32, 3, 1, 1)), dtype=dt,
                    name="branch1")(x, train)
        x2 = Branch(((32, 1, 1, 0), (32, 3, 1, 1), (32, 3, 1, 1)),
                    dtype=dt, name="branch2")(x, train)
        out = jnp.concatenate([x0, x1, x2], axis=-1)
        out = nn.Conv(256, (1, 1), dtype=dt, name="conv2d")(out)
        return nn.relu(out * self.scale + x)


class Block17(nn.Module):
    scale: float = 1.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        x0 = BasicConv2d(128, 1, 1, 0, dtype=dt, name="branch0")(x, train)
        x1 = Branch(
            (
                (128, 1, 1, 0),
                (128, (1, 7), 1, (0, 3)),
                (128, (7, 1), 1, (3, 0)),
            ),
            dtype=dt,
            name="branch1",
        )(x, train)
        out = jnp.concatenate([x0, x1], axis=-1)
        out = nn.Conv(896, (1, 1), dtype=dt, name="conv2d")(out)
        return nn.relu(out * self.scale + x)


class Block8(nn.Module):
    scale: float = 1.0
    no_relu: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        x0 = BasicConv2d(192, 1, 1, 0, dtype=dt, name="branch0")(x, train)
        x1 = Branch(
            (
                (192, 1, 1, 0),
                (192, (1, 3), 1, (0, 1)),
                (192, (3, 1), 1, (1, 0)),
            ),
            dtype=dt,
            name="branch1",
        )(x, train)
        out = jnp.concatenate([x0, x1], axis=-1)
        out = nn.Conv(1792, (1, 1), dtype=dt, name="conv2d")(out)
        out = out * self.scale + x
        if not self.no_relu:
            out = nn.relu(out)
        return out


class Mixed6a(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x0 = BasicConv2d(384, 3, 2, 0, dtype=self.dtype,
                         name="branch0")(x, train)
        x1 = Branch(((192, 1, 1, 0), (192, 3, 1, 1), (256, 3, 2, 0)),
                    dtype=self.dtype, name="branch1")(x, train)
        x2 = max_pool_ceil(x, 3, 2, ceil_mode=False)
        return jnp.concatenate([x0, x1, x2], axis=-1)


class Mixed7a(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x0 = Branch(((256, 1, 1, 0), (384, 3, 2, 0)), dtype=self.dtype,
                    name="branch0")(x, train)
        x1 = Branch(((256, 1, 1, 0), (256, 3, 2, 0)), dtype=self.dtype,
                    name="branch1")(x, train)
        x2 = Branch(((256, 1, 1, 0), (256, 3, 1, 1), (256, 3, 2, 0)),
                    dtype=self.dtype, name="branch2")(x, train)
        x3 = max_pool_ceil(x, 3, 2, ceil_mode=False)
        return jnp.concatenate([x0, x1, x2, x3], axis=-1)


class Repeat(nn.Module):
    """torch nn.Sequential of identical blocks, children named '0'.."""

    block: Callable[..., nn.Module]
    count: int
    scale: float
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.count):
            x = self.block(scale=self.scale, dtype=self.dtype,
                           name=str(i))(x, train)
        return x


class InceptionResnetV1(nn.Module):
    classify: bool = False
    num_classes: Optional[int] = None
    dropout_prob: float = 0.6
    # flax compute dtype: None keeps full f32 (parity path); bf16 runs
    # every conv/BN on the MXU in bf16 with f32 params — without it the
    # first BatchNorm promotes activations back to f32 and the whole
    # trunk computes in f32 (~2x conv time on v5e)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        x = BasicConv2d(32, 3, 2, 0, dtype=dt, name="conv2d_1a")(x, train)
        x = BasicConv2d(32, 3, 1, 0, dtype=dt, name="conv2d_2a")(x, train)
        x = BasicConv2d(64, 3, 1, 1, dtype=dt, name="conv2d_2b")(x, train)
        x = max_pool_ceil(x, 3, 2, ceil_mode=False)
        x = BasicConv2d(80, 1, 1, 0, dtype=dt, name="conv2d_3b")(x, train)
        x = BasicConv2d(192, 3, 1, 0, dtype=dt, name="conv2d_4a")(x, train)
        x = BasicConv2d(256, 3, 2, 0, dtype=dt, name="conv2d_4b")(x, train)
        x = Repeat(Block35, 5, 0.17, dtype=dt, name="repeat_1")(x, train)
        x = Mixed6a(dtype=dt, name="mixed_6a")(x, train)
        x = Repeat(Block17, 10, 0.10, dtype=dt, name="repeat_2")(x, train)
        x = Mixed7a(dtype=dt, name="mixed_7a")(x, train)
        x = Repeat(Block8, 5, 0.20, dtype=dt, name="repeat_3")(x, train)
        x = Block8(no_relu=True, dtype=dt, name="block8")(x, train)
        x = jnp.mean(x, axis=(1, 2))  # adaptive avg pool to 1x1
        x = nn.Dropout(self.dropout_prob, deterministic=not train)(x)
        x = nn.Dense(512, use_bias=False, dtype=dt,
                     name="last_linear")(x)
        # final BN + normalise in f32: the 512-d embedding is the
        # pipeline contract (cosine >= 0.999)
        x = x.astype(jnp.float32)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-3,
            name="last_bn",
        )(x)
        if self.classify:
            x = nn.Dense(self.num_classes, name="logits")(x)
            return nn.log_softmax(x, axis=-1)
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True).clip(1e-12)


_PRETRAINED_CLASSES = {"vggface2": 8631, "casia-webface": 10575}
_PRETRAINED_FILES = {
    "vggface2": "20180402-114759-vggface2",
    "casia-webface": "20180408-102900-casia-webface",
}


def pretrained_weight_candidates(name):
    """Candidate local paths for the published facenet-pytorch weights
    (converted .npz preferred, raw torch .pt accepted)."""
    stem = _PRETRAINED_FILES[name]
    torch_home = os.path.expanduser(
        os.getenv("TORCH_HOME",
                  os.path.join(os.getenv("XDG_CACHE_HOME", "~/.cache"),
                               "torch"))
    )
    here = os.path.join(os.path.dirname(__file__), "weights")
    return [
        os.path.join(here, stem + ".npz"),
        os.path.join(torch_home, "checkpoints", stem + ".npz"),
        os.path.join(torch_home, "checkpoints", stem + ".pt"),
    ]


def build_inception_resnet_v1(pretrained=None, classify=False,
                              num_classes=None, dropout_prob=0.6,
                              device=None, weights_path=None,
                              dtype=None):
    """Factory mirroring the reference constructor semantics
    (inception_resnet_v1.py:202-270). Returns (module, variables);
    variables is None when no weights were found (caller initialises)."""
    from .torch_convert import convert_state_dict, load_torch_checkpoint

    if pretrained is not None and pretrained not in _PRETRAINED_CLASSES:
        raise ValueError(
            'Pretrained models only exist for "vggface2" and '
            '"casia-webface"'
        )
    if pretrained is None and classify and num_classes is None:
        raise Exception(
            'If "pretrained" is not specified and "classify" is True, '
            '"num_classes" must be specified'
        )

    n_cls = num_classes
    if pretrained is not None and not (classify and num_classes):
        n_cls = _PRETRAINED_CLASSES[pretrained]
    model = InceptionResnetV1(classify=classify,
                              num_classes=n_cls if classify else None,
                              dropout_prob=dropout_prob, dtype=dtype)

    variables = None
    if pretrained is not None:
        candidates = ([weights_path] if weights_path else
                      pretrained_weight_candidates(pretrained))
        for path in candidates:
            if path and os.path.exists(path):
                if path.endswith(".npz"):
                    loaded = np.load(path)
                    sd = {k: loaded[k] for k in loaded.files}
                else:
                    sd = load_torch_checkpoint(path)
                drop_logits = not classify or (
                    num_classes is not None
                    and num_classes != _PRETRAINED_CLASSES[pretrained]
                )
                if drop_logits:
                    sd = {k: v for k, v in sd.items()
                          if not k.startswith("logits.")}
                variables = convert_state_dict(sd)
                if drop_logits and classify:
                    # fresh logits head like the reference re-init
                    head = nn.Dense(num_classes)
                    hv = head.init(jax.random.PRNGKey(0),
                                   jnp.zeros((1, 512)))
                    variables["params"]["logits"] = hv["params"]
                break
        if variables is None:
            print(
                f"Warning: pretrained='{pretrained}' requested but no "
                "local weights found (searched "
                f"{[c for c in candidates if c]}); the encoder is "
                "randomly initialised. Convert the published torch "
                "checkpoint with tools/convert_weights.py."
            )
    return model, variables
