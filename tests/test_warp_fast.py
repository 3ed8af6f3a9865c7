"""Gather-free similarity warp vs the exact bilinear warp, across the
full angle range and typical alignment magnitudes."""

import numpy as np
import pytest

import jax.numpy as jnp

from vn_celeb_face_recognition_tpu.ops.image import warp_affine
from vn_celeb_face_recognition_tpu.ops.similarity import umeyama_similarity
from vn_celeb_face_recognition_tpu.ops.warp_fast import (
    batched_similarity_warp,
    similarity_warp,
)
from vn_celeb_face_recognition_tpu.pipeline.align import center_point_dict


def smooth_image(rng, n=224):
    base = rng.uniform(0, 255, (n // 8, n // 8, 3))
    img = np.stack(
        [np.kron(base[..., c], np.ones((8, 8))) for c in range(3)], -1
    )
    # light box blur to keep interpolation differences sub-pixel
    k = np.ones((5, 5)) / 25.0
    from scipy.signal import convolve2d

    img = np.stack(
        [convolve2d(img[..., c], k, mode="same") for c in range(3)], -1
    )
    return img.astype(np.float32)


@pytest.mark.parametrize("deg", [0, 9, -17, 44, 61, 100, 178, 90, -90])
def test_matches_exact_warp(rng, deg):
    img = smooth_image(rng)
    th = np.deg2rad(deg)
    s = 0.8
    lin = np.array(
        [
            [np.cos(th) * s, -np.sin(th) * s],
            [np.sin(th) * s, np.cos(th) * s],
        ]
    )
    # pick the translation so the window centre lands on the output
    # centre — keeps every angle comparable instead of off-frame
    t = np.array([55.5, 55.5]) - lin @ np.array([111.5, 111.5])
    m = np.concatenate([lin, t[:, None]], axis=1).astype(np.float32)
    exact = np.asarray(warp_affine(jnp.asarray(img), jnp.asarray(m),
                                   (112, 112)))
    fast = np.asarray(similarity_warp(jnp.asarray(img), jnp.asarray(m),
                                      112))
    from scipy.ndimage import binary_erosion

    interior = (exact.sum(-1) > 1) & (fast.sum(-1) > 1)
    # the zero-border cut is one resampling pass wide in the shear
    # path; compare away from it
    interior = binary_erosion(interior, iterations=3)
    if interior.mean() < 0.2:
        pytest.skip("transform maps mostly outside the window")
    d = np.abs(exact - fast)[interior]
    # multi-pass bilinear vs single-pass: sub-level mean, a few levels
    # at sharp edges
    assert d.mean() < 1.5
    assert np.percentile(d, 99) < 10.0


def test_alignment_quality_end_to_end(rng):
    """Solve alignment from synthetic landmarks and verify the fast
    warp sends them onto the template (the contract the aligned-face
    consumer relies on)."""
    template = center_point_dict["(112, 112)"]
    th = np.deg2rad(20)
    scale = 1.6
    rot = np.array(
        [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
    ) * scale
    detected = template @ rot.T + np.array([40.0, 25.0])
    m = np.asarray(
        umeyama_similarity(jnp.asarray(detected), jnp.asarray(template))
    )

    img = np.zeros((224, 224, 3), dtype=np.float32)
    for px, py in detected:
        x, y = int(round(px)), int(round(py))
        img[max(y - 2, 0):y + 3, max(x - 2, 0):x + 3] = 255.0

    fast = np.asarray(
        similarity_warp(jnp.asarray(img), jnp.asarray(m), 112)
    )
    # each template point should sit on a bright blob in the output
    for px, py in template:
        x, y = int(round(px)), int(round(py))
        patch = fast[max(y - 3, 0):y + 4, max(x - 3, 0):x + 4]
        assert patch.max() > 100.0


def test_batched_matches_single(rng):
    img = smooth_image(rng)
    ms = []
    for deg in (5.0, -30.0):
        th = np.deg2rad(deg)
        ms.append(
            [
                [np.cos(th), -np.sin(th), 10.0],
                [np.sin(th), np.cos(th), 5.0],
            ]
        )
    ms = np.asarray(ms, dtype=np.float32)
    windows = jnp.asarray(np.stack([img, img]))
    batched = np.asarray(
        batched_similarity_warp(windows, jnp.asarray(ms), 112)
    )
    for i in range(2):
        single = np.asarray(
            similarity_warp(jnp.asarray(img), jnp.asarray(ms[i]), 112)
        )
        np.testing.assert_allclose(batched[i], single, atol=1e-3)
