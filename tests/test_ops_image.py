"""Image-op tests with torch (area resize) and cv2 (warp) as oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from vn_celeb_face_recognition_tpu.ops import image as I


def test_area_resize_matches_torch_interpolate(rng):
    torch = pytest.importorskip("torch")
    x = rng.uniform(0, 255, size=(2, 37, 53, 3)).astype(np.float32)
    for out_hw in [(12, 17), (37, 53), (24, 24), (48, 48)]:
        got = np.asarray(I.area_resize(jnp.asarray(x), out_hw))
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        want = torch.nn.functional.interpolate(xt, size=out_hw, mode="area")
        want = want.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_area_resize_upscale_matches_torch(rng):
    torch = pytest.importorskip("torch")
    x = rng.uniform(0, 255, size=(1, 16, 16, 3)).astype(np.float32)
    got = np.asarray(I.area_resize(jnp.asarray(x), (33, 41)))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = torch.nn.functional.interpolate(xt, size=(33, 41), mode="area")
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_pyramid_area_resize_matches_per_level(rng):
    """The plane-major multi-level pyramid pass equals per-level
    area_resize (and hence torch 'area' semantics) to f32 rounding."""
    x = rng.uniform(0, 255, size=(2, 97, 83, 3)).astype(np.float32)
    sizes = [(24, 21), (17, 15), (12, 10), (97, 83)]
    outs = I.pyramid_area_resize(jnp.asarray(x), sizes)
    assert len(outs) == len(sizes)
    for hw, got in zip(sizes, outs):
        want = np.asarray(I.area_resize(jnp.asarray(x), hw))
        assert got.shape == (2,) + hw + (3,)
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=1e-5, atol=1e-4)


def test_warp_affine_matches_cv2(rng):
    # near-exact match INCLUDING the 1-px border fade band (per-tap
    # BORDER_CONSTANT semantics): the reference par path warps
    # zero-bordered face crops, so the band is observable downstream
    # (test_pipeline_differential pins the end-to-end consequence).
    cv2 = pytest.importorskip("cv2")
    cases = [
        ((64, 80, 3), [[0.9, 0.1, 3.0], [-0.1, 0.9, 5.0]], (48, 56)),
        # upscaled small crop: the demo pipeline's alignment regime
        ((40, 40, 3), [[3.7, 0.21, -5.0], [-0.21, 3.7, -11.0]],
         (160, 160)),
        # mostly out-of-bounds window
        ((30, 30, 3), [[1.0, 0.0, -25.0], [0.0, 1.0, -25.0]], (40, 40)),
    ]
    for shape, m, out_hw in cases:
        img = rng.uniform(0, 255, size=shape).astype(np.float32)
        m = np.array(m, dtype=np.float32)
        got = np.asarray(I.warp_affine(jnp.asarray(img), jnp.asarray(m),
                                       out_hw))
        want = cv2.warpAffine(img, m, out_hw[::-1], borderValue=0.0)
        np.testing.assert_allclose(got, want, atol=0.01)


def test_crop_resize_covers_box(rng):
    # a constant-color box region must crop to that constant
    img = np.zeros((50, 50, 3), dtype=np.float32)
    img[9:30, 4:20] = 7.0
    box = jnp.asarray([5.0, 10.0, 20.0, 30.0])  # 1-based inclusive
    out = np.asarray(I.crop_resize_bilinear(jnp.asarray(img), box, 24))
    np.testing.assert_allclose(out, 7.0, atol=1e-4)


def test_fixed_standardization_and_prewhiten(rng):
    x = rng.uniform(0, 255, size=(8, 8, 3)).astype(np.float32)
    s = np.asarray(I.fixed_image_standardization(jnp.asarray(x)))
    np.testing.assert_allclose(s, (x - 127.5) / 128.0, atol=1e-6)
    w = np.asarray(I.prewhiten(jnp.asarray(x)))
    assert abs(w.mean()) < 1e-4
    assert abs(w.std() - 1.0) < 1e-3


def test_invert_affine():
    m = jnp.asarray([[1.5, 0.2, 3.0], [-0.3, 0.8, -2.0]])
    inv = I.invert_affine(m)
    # compose forward . inverse == identity
    a = np.vstack([np.asarray(m), [0, 0, 1]])
    b = np.vstack([np.asarray(inv), [0, 0, 1]])
    np.testing.assert_allclose(a @ b, np.eye(3), atol=1e-5)


def test_crop_area_resize_matches_torch_adaptive_pool(rng):
    """Mask-matmul crop resize vs torch integer-crop +
    adaptive_avg_pool2d (the MTCNN stage-2/3 resample)."""
    torch = pytest.importorskip("torch")

    imgs = rng.integers(0, 256, size=(2, 70, 90, 3)).astype(np.float32)
    boxes = np.array(
        [
            [
                [5.0, 9.0, 40.0, 50.0],
                [12.0, 3.0, 77.0, 66.0],
            ],
            [
                [1.0, 1.0, 90.0, 70.0],
                [33.0, 12.0, 61.0, 44.0],
            ],
        ],
        dtype=np.float32,
    )
    for size in (24, 48):
        got = np.asarray(
            I.grouped_crop_area_resize(
                jnp.asarray(imgs), jnp.asarray(boxes), size
            )
        )
        for b in range(2):
            for k in range(2):
                x1, y1, x2, y2 = boxes[b, k].astype(int)
                crop = imgs[b, y1 - 1:y2, x1 - 1:x2]
                t = torch.from_numpy(crop.transpose(2, 0, 1))[None]
                want = torch.nn.functional.adaptive_avg_pool2d(t, size)
                want = want[0].numpy().transpose(1, 2, 0)
                np.testing.assert_allclose(got[b, k], want, rtol=1e-5,
                                           atol=1e-3)
