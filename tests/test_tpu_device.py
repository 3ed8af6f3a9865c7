"""Opt-in REAL-DEVICE kernel regressions: Pallas warp + NMS outputs on
the TPU must equal interpret mode (the numbers STATUS.md reports were
previously verified only manually).

Run with::

    VN_TPU_TESTS=1 python -m pytest -m tpu tests/test_tpu_device.py -q

On CPU (the default conftest platform) every test self-skips. Keep the
cases small — each distinct program costs minutes of remote
compilation on this rig, and the TPU is single-tenant.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu


def _require_tpu():
    if jax.devices()[0].platform == "cpu":
        pytest.skip("real TPU backend required (VN_TPU_TESTS=1)")


def _fetch(x):
    # this rig's relay backend: block_until_ready does not track remote
    # completion — np.asarray forces the fetch that drains the queue
    return np.asarray(jax.device_get(x))


def test_warp_pallas_device_matches_interpret(rng):
    _require_tpu()
    from test_warp_fast import smooth_image

    from vn_celeb_face_recognition_tpu.ops.warp_pallas import (
        batched_similarity_warp_pallas,
    )

    windows = np.stack(
        [smooth_image(rng, 224) for _ in range(4)]
    ).astype(np.float32)

    def mat(deg, s, cx, cy):
        th = np.deg2rad(deg)
        lin = np.array([[np.cos(th) * s, -np.sin(th) * s],
                        [np.sin(th) * s, np.cos(th) * s]])
        t = np.array([55.5, 55.5]) - lin @ np.array([cx, cy])
        return np.concatenate([lin, t[:, None]], axis=1)

    mats = np.stack([
        mat(9.0, 0.8, 111.5, 111.5),
        mat(-17.0, 0.6, 100.0, 120.0),
        mat(44.0, 0.75, 90.0, 101.0),
        mat(100.0, 0.66, 111.5, 111.5),
    ]).astype(np.float32)

    want = batched_similarity_warp_pallas(
        jnp.asarray(windows), jnp.asarray(mats), 112, interpret=True
    )
    want = np.asarray(jax.device_get(want))
    got = _fetch(batched_similarity_warp_pallas(
        jnp.asarray(windows), jnp.asarray(mats), 112
    ))
    assert got.shape == want.shape
    # bf16 matmul tails on device vs f32 interpreter: small mean error
    err = np.abs(got - want).mean()
    assert err < 0.5, f"device-vs-interpret mean abs err {err}"
    assert np.abs(got - want).max() < 16.0


def test_nms_pallas_device_matches_interpret(rng):
    _require_tpu()
    from vn_celeb_face_recognition_tpu.ops.nms_pallas import (
        nms_keep_mask_pallas,
    )

    b, k = 4, 256
    centers = rng.uniform(20, 200, size=(b, k, 2)).astype(np.float32)
    sizes = rng.uniform(8, 60, size=(b, k, 2)).astype(np.float32)
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2],
                           axis=-1)
    scores = rng.uniform(0.05, 1.0, size=(b, k)).astype(np.float32)
    valid = (rng.uniform(size=(b, k)) > 0.1)

    args = (jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid))
    want = np.asarray(jax.device_get(
        nms_keep_mask_pallas(*args, iou_thr=0.5, interpret=True)
    ))
    got = _fetch(nms_keep_mask_pallas(*args, iou_thr=0.5))
    np.testing.assert_array_equal(got, want)

    # "Min"-mode denominator switch (stage-3 NMS semantics)
    want_min = np.asarray(jax.device_get(nms_keep_mask_pallas(
        *args, iou_thr=0.5, min_mode=True, interpret=True
    )))
    got_min = _fetch(nms_keep_mask_pallas(
        *args, iou_thr=0.5, min_mode=True
    ))
    np.testing.assert_array_equal(got_min, want_min)


def test_crop_pallas_device_matches_interpret(rng):
    _require_tpu()
    from vn_celeb_face_recognition_tpu.ops.boxes import clamp_boxes
    from vn_celeb_face_recognition_tpu.ops.crop_pallas import (
        grouped_crop_area_resize_pallas,
    )

    gen = np.random.default_rng(11)
    images = gen.integers(0, 256, size=(2, 160, 160, 3)).astype(
        np.float32)
    x1 = gen.integers(-10, 150, size=(2, 8))
    y1 = gen.integers(-10, 150, size=(2, 8))
    boxes = np.stack(
        [x1, y1,
         x1 + gen.integers(4, 160, size=(2, 8)),
         y1 + gen.integers(4, 160, size=(2, 8))], -1
    ).astype(np.float32)
    boxes = clamp_boxes(jnp.asarray(boxes), 160, 160)

    want = np.asarray(jax.device_get(grouped_crop_area_resize_pallas(
        jnp.asarray(images), boxes, 24, interpret=True)))
    got = _fetch(grouped_crop_area_resize_pallas(
        jnp.asarray(images), boxes, 24))
    # both sides sum exact integers in f32 — equality, not tolerance
    np.testing.assert_array_equal(got, want)
