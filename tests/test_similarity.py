"""Umeyama similarity solve tests: exact recovery of a known
similarity transform, least-squares behaviour under noise, and
cross-check against cv2.estimateAffinePartial2D where available."""

import numpy as np
import jax.numpy as jnp
import pytest

from vn_celeb_face_recognition_tpu.ops.similarity import umeyama_similarity


def make_transform(theta, scale, tx, ty):
    c, s = np.cos(theta) * scale, np.sin(theta) * scale
    return np.array([[c, -s, tx], [s, c, ty]], dtype=np.float64)


def apply(m, pts):
    return pts @ m[:, :2].T + m[:, 2]


def test_exact_recovery(rng):
    src = rng.uniform(0, 100, size=(5, 2))
    m_true = make_transform(0.3, 1.4, 10.0, -5.0)
    dst = apply(m_true, src)
    m = np.asarray(umeyama_similarity(jnp.asarray(src), jnp.asarray(dst)))
    np.testing.assert_allclose(m, m_true, atol=1e-4)


def test_least_squares_under_noise(rng):
    src = rng.uniform(0, 100, size=(50, 2))
    m_true = make_transform(-0.8, 0.7, 3.0, 9.0)
    dst = apply(m_true, src) + rng.normal(scale=0.5, size=(50, 2))
    m = np.asarray(umeyama_similarity(jnp.asarray(src), jnp.asarray(dst)))
    # linear part is tightly determined; translation floats with the
    # noise (std ~ sigma/sqrt(n))
    np.testing.assert_allclose(m[:, :2], m_true[:, :2], atol=0.01)
    np.testing.assert_allclose(m[:, 2], m_true[:, 2], atol=0.5)


def test_against_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    src = rng.uniform(0, 112, size=(5, 2)).astype(np.float32)
    m_true = make_transform(0.15, 1.1, -4.0, 2.0)
    dst = (apply(m_true, src) + rng.normal(scale=0.8, size=(5, 2))).astype(
        np.float32
    )
    m = np.asarray(umeyama_similarity(jnp.asarray(src), jnp.asarray(dst)))
    m_cv, _ = cv2.estimateAffinePartial2D(
        src.reshape(-1, 1, 2), dst.reshape(-1, 1, 2), method=cv2.LMEDS
    )
    np.testing.assert_allclose(m, m_cv, atol=0.05)


def test_alignment_maps_landmarks_to_template(rng):
    """End-to-end: solving detected->canonical then warping sends the
    detected landmarks onto the canonical template (the alignment
    contract of reference align_face.py:51-57)."""
    canonical = np.array(
        [
            [38.2946, 51.6963],
            [73.5318, 51.5014],
            [56.0252, 71.7366],
            [41.5493, 92.3655],
            [70.7299, 92.2041],
        ],
        dtype=np.float32,
    )
    m_true = make_transform(0.2, 2.0, 40.0, 30.0)
    detected = apply(m_true, canonical).astype(np.float32)
    m = np.asarray(
        umeyama_similarity(jnp.asarray(detected), jnp.asarray(canonical))
    )
    mapped = apply(m, detected)
    np.testing.assert_allclose(mapped, canonical, atol=1e-2)
