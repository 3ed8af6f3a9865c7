"""2-branch emotion ResNet-50: class head (emotion tags) + projection.

Reference: /root/reference/models/resnet_2_branch.py:12-89 — a stock
ResNet-50 trunk, 7x7 average pool, then TWO linear heads: ``fc``
(num_classes emotion tags, default 690 in cfg/emotion) and ``proj``
(300-d projection). ``forward`` returns (x_cls, x_proj).

Checkpoint note: the reference wraps the model in nn.DataParallel
before loading, so its state_dict keys carry a ``module.`` prefix
(resnet_2_branch.py:86); the loader here strips it.
"""

import os
from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

class ResNet2Branch(nn.Module):
    layers: Tuple[int, int, int, int] = (3, 4, 6, 3)
    num_classes: int = 1000
    num_projections: int = 300
    # flax compute dtype (bf16 trunk, f32 heads); None = full f32
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # trunk modules live at the top level (torch names conv1, bn1,
        # layer1..4), so inline the trunk rather than nesting it.
        from .resnet_common import ResLayer, _bn

        dt = self.dtype
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=dt, name="conv1")(x)
        x = _bn("bn1", train, dt)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        x = ResLayer(64, self.layers[0], 1, 64, dtype=dt,
                     name="layer1")(x, train)
        x = ResLayer(128, self.layers[1], 2, 256, dtype=dt,
                     name="layer2")(x, train)
        x = ResLayer(256, self.layers[2], 2, 512, dtype=dt,
                     name="layer3")(x, train)
        x = ResLayer(512, self.layers[3], 2, 1024, dtype=dt,
                     name="layer4")(x, train)
        # AvgPool2d(7, stride=1) on a 7x7 map == global mean
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        x_cls = nn.Dense(self.num_classes, name="fc")(x)
        x_proj = nn.Dense(self.num_projections, name="proj")(x)
        return x_cls, x_proj


def resnet_2branch_50(**kwargs):
    kwargs.pop("pretrained", None)
    kwargs.pop("checkpoint_path", None)
    return ResNet2Branch(layers=(3, 4, 6, 3), **kwargs)


def build_resnet_2branch_50(pretrained=False, checkpoint_path=None,
                            num_classes=1000, num_projections=300,
                            weights_path=None, dtype=None):
    """Factory mirroring reference resnet_2branch_50(). Returns
    (module, variables-or-None)."""
    import numpy as np

    from .torch_convert import (
        convert_state_dict,
        load_torch_checkpoint,
        strip_prefix,
    )

    model = ResNet2Branch(num_classes=num_classes,
                          num_projections=num_projections, dtype=dtype)
    variables = None
    for path in [weights_path, checkpoint_path]:
        if path and os.path.exists(path):
            if path.endswith(".npz"):
                loaded = np.load(path)
                sd = {k: loaded[k] for k in loaded.files}
            else:
                sd = load_torch_checkpoint(path)
            sd = strip_prefix(sd, "module.")
            variables = convert_state_dict(sd)
            break
    return model, variables
