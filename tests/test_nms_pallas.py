"""Pallas NMS kernel vs the XLA fixpoint implementation (interpret
mode on CPU; the compiled path runs on TPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from vn_celeb_face_recognition_tpu.ops import boxes as B
from vn_celeb_face_recognition_tpu.ops.nms_pallas import (
    nms_keep_mask_pallas,
)


def random_boxes(gen, b, k, size=200.0):
    xy = gen.uniform(0, size, size=(b, k, 2))
    wh = gen.uniform(5, 60, size=(b, k, 2))
    return np.concatenate([xy, xy + wh], axis=-1).astype(np.float32)


@pytest.mark.parametrize("offset,min_mode", [(0.0, False), (1.0, False),
                                             (1.0, True)])
def test_pallas_matches_xla(rng, offset, min_mode):
    b, k = 4, 128
    boxes = random_boxes(rng, b, k)
    scores = rng.uniform(0.0, 1.0, size=(b, k)).astype(np.float32)
    valid = rng.uniform(size=(b, k)) > 0.2

    want = np.asarray(
        B.batched_nms_keep_mask(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
            0.5, offset=offset, min_mode=min_mode,
        )
    )
    got = np.asarray(
        nms_keep_mask_pallas(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
            0.5, offset=offset, min_mode=min_mode, interpret=True,
        )
    )
    np.testing.assert_array_equal(got, want)


def test_pallas_tie_breaking(rng):
    """Saturated equal scores: ties must resolve by row order exactly
    like the XLA version."""
    b, k = 2, 64
    boxes = random_boxes(rng, b, k, size=50.0)  # heavy overlap
    scores = np.ones((b, k), dtype=np.float32)
    valid = np.ones((b, k), dtype=bool)
    want = np.asarray(
        B.batched_nms_keep_mask(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
            0.4,
        )
    )
    got = np.asarray(
        nms_keep_mask_pallas(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
            0.4, interpret=True,
        )
    )
    np.testing.assert_array_equal(got, want)
