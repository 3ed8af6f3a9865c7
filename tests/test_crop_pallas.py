"""Pallas grouped-crop kernel vs the XLA mask-matmul formulation.

Both paths implement the reference's integer crop + torch
adaptive_avg_pool2d (detect_face.py:109-112, 304-306) and sum exact
integers in f32, so on uint8-valued inputs they must agree EXACTLY.
Interpret mode runs on CPU; tests/test_tpu_device.py covers the real
device against interpret.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vn_celeb_face_recognition_tpu.ops.boxes import clamp_boxes
from vn_celeb_face_recognition_tpu.ops.crop_pallas import (
    grouped_crop_area_resize_pallas,
)
from vn_celeb_face_recognition_tpu.ops.image import (
    grouped_crop_area_resize,
)


def _random_case(seed, b, k, h, w, size):
    gen = np.random.default_rng(seed)
    images = gen.integers(0, 256, size=(b, h, w, 3)).astype(np.float32)
    x1 = gen.integers(-20, w - 2, size=(b, k))
    y1 = gen.integers(-20, h - 2, size=(b, k))
    x2 = x1 + gen.integers(1, w, size=(b, k))
    y2 = y1 + gen.integers(1, h, size=(b, k))
    boxes = np.stack([x1, y1, x2, y2], -1).astype(np.float32)
    boxes = clamp_boxes(jnp.asarray(boxes), w, h)
    return jnp.asarray(images), boxes, size


@pytest.mark.parametrize(
    "seed,b,k,h,w,size",
    [
        (0, 2, 5, 100, 120, 24),   # ragged K (pads to a block), odd dims
        (1, 3, 16, 160, 160, 24),
        (2, 2, 8, 131, 97, 48),    # 48-output (ONet) path
        (3, 1, 1, 64, 64, 24),     # single tiny crop
    ],
)
def test_crop_pallas_matches_xla_exactly(seed, b, k, h, w, size):
    images, boxes, s = _random_case(seed, b, k, h, w, size)
    ref = np.asarray(grouped_crop_area_resize(images, boxes, s))
    got = np.asarray(
        grouped_crop_area_resize_pallas(images, boxes, s,
                                        interpret=True)
    )
    assert got.shape == ref.shape
    np.testing.assert_array_equal(got, ref)


def test_crop_pallas_full_frame_box():
    """A crop covering the whole frame (largest bins, the clamp path's
    extreme) stays exact."""
    gen = np.random.default_rng(7)
    images = jnp.asarray(
        gen.integers(0, 256, size=(1, 240, 320, 3)).astype(np.float32)
    )
    boxes = jnp.asarray([[[1.0, 1.0, 320.0, 240.0]]])
    ref = np.asarray(grouped_crop_area_resize(images, boxes, 24))
    got = np.asarray(
        grouped_crop_area_resize_pallas(images, boxes, 24,
                                        interpret=True)
    )
    np.testing.assert_array_equal(got, ref)
