"""Named transforms, as BATCHED on-device functions.

The reference registry (data_loader/__init__.py:84-89) maps names to
per-sample torchvision Compose pipelines that run on the host. Here a
transform is ``fn(images, rng) -> float32 batch`` executed inside the
jitted train/eval step — augmentation rides the VPU and fuses with the
encoder forward. ``rng`` is ignored by deterministic transforms.

Registered names (same as the reference):
  default      -- (x - 127.5) / 128                (fix_std)
  facenet_aug  -- rotate +-10, random-crop 160 pad 2, hflip, fix_std
  rank1_aug    -- flip + OneOf[8 photometric ops] + prewhiten
  emotion_inf  -- area-resize 224, /255, ImageNet normalise
"""

import jax
import jax.numpy as jnp

from ..ops import augment as A
from ..ops.image import (
    area_resize,
    fixed_image_standardization,
    imagenet_normalize,
    prewhiten,
)


def transform_default(images, rng=None):
    return fixed_image_standardization(images.astype(jnp.float32))


def transform_facenet_aug(images, rng):
    # batched 3-shear pipeline (ops/augment.facenet_aug_shear): the
    # vmapped exact-warp path costs 137.4 ms of the 171.2 ms train
    # step at batch 256 on the v5e (80% — tools/profile_train_step);
    # the XLA K-way-roll shear rotation removes the gathers entirely.
    # (The Pallas batched_similarity_warp rewrite was also measured:
    # 559 ms — see facenet_aug_batch's docstring.)
    return A.facenet_aug_shear(rng, images.astype(jnp.float32))


def transform_rank1_aug(images, rng):
    return A.batch_apply(A.rank1_vn_celeb_aug, rng,
                         images.astype(jnp.float32))


def transform_emotion_inf(images, rng=None):
    x = area_resize(images.astype(jnp.float32), (224, 224)) / 255.0
    return imagenet_normalize(x)


def transform_prewhiten(images, rng=None):
    return jax.vmap(prewhiten)(images.astype(jnp.float32))


transforms_dict = {
    "default": transform_default,
    "facenet_aug": transform_facenet_aug,
    "rank1_aug": transform_rank1_aug,
    "emotion_inf": transform_emotion_inf,
    "prewhiten": transform_prewhiten,
    "none": None,
}


def get_transform(name):
    if name is None or name == "none":
        return None
    if name not in transforms_dict:
        raise KeyError(
            f"Unknown transform '{name}'; have {sorted(transforms_dict)}"
        )
    return transforms_dict[name]


def with_resize(transform_fn, size):
    """Prepend an area resize (the reference's cfg 'resize' option,
    train.py:27-34 — without its shared-Compose mutation bug)."""

    def wrapped(images, rng=None):
        resized = area_resize(images.astype(jnp.float32), (size, size))
        return transform_fn(resized, rng)

    return wrapped
