"""Pallas similarity-warp kernel vs the exact bilinear warp (interpret
mode on CPU), across all four quadrants and typical alignment
magnitudes. This pins the kernel the fused engine runs on TPU."""

import numpy as np
import pytest

import jax.numpy as jnp

from vn_celeb_face_recognition_tpu.ops.image import warp_affine
from vn_celeb_face_recognition_tpu.ops.warp_pallas import (
    batched_similarity_warp_pallas,
)

from test_warp_fast import smooth_image


def _mat(deg, s=0.8, centre=111.5):
    th = np.deg2rad(deg)
    lin = np.array(
        [
            [np.cos(th) * s, -np.sin(th) * s],
            [np.sin(th) * s, np.cos(th) * s],
        ]
    )
    t = np.array([55.5, 55.5]) - lin @ np.array([centre, centre])
    return np.concatenate([lin, t[:, None]], axis=1).astype(np.float32)


@pytest.mark.parametrize(
    "degs", [(0.0, 9.0, -17.0, 44.0), (61.0, 100.0, 178.0, -130.0),
             (90.0, -90.0, -44.9, 269.0),
             # exact quadrant boundaries: |phi_r| == pi/4 maximises the
             # shear coefficients, stressing the row-block shift-drift
             # bound (dev) in the blocked shear passes
             (45.0, -45.0, 135.0, -135.0)]
)
def test_pallas_matches_exact_warp(rng, degs):
    from scipy.ndimage import binary_erosion

    img = smooth_image(rng)
    ms = np.stack([_mat(d) for d in degs])
    windows = jnp.asarray(np.stack([img] * len(degs)))
    got = np.asarray(
        batched_similarity_warp_pallas(
            windows, jnp.asarray(ms), 112, interpret=True
        )
    )
    for i, d in enumerate(degs):
        exact = np.asarray(
            warp_affine(jnp.asarray(img), jnp.asarray(ms[i]), (112, 112))
        )
        interior = (exact.sum(-1) > 1) & (got[i].sum(-1) > 1)
        interior = binary_erosion(interior, iterations=3)
        assert interior.mean() > 0.2, f"deg={d}: mostly off-window"
        diff = np.abs(exact - got[i])[interior]
        assert diff.mean() < 2.0, f"deg={d}: mean {diff.mean()}"
        assert np.percentile(diff, 99) < 14.0, f"deg={d}"


def test_pallas_matches_xla_shear_path(rng):
    """The kernel and the XLA fallback (ops.warp_fast) implement the
    same factorisation; the engine switches between them by backend, so
    they must agree closely everywhere (not just away from edges)."""
    from vn_celeb_face_recognition_tpu.ops.warp_fast import (
        batched_similarity_warp,
    )

    img = smooth_image(rng)
    degs = (3.0, -28.0, 77.0, 191.0)
    ms = np.stack([_mat(d) for d in degs])
    windows = jnp.asarray(np.stack([img] * len(degs)))
    got = np.asarray(
        batched_similarity_warp_pallas(
            windows, jnp.asarray(ms), 112, interpret=True
        )
    )
    want = np.asarray(
        batched_similarity_warp(windows, jnp.asarray(ms), 112)
    )
    diff = np.abs(got - want)
    # both paths shear an identical 160 intermediate; the only drift is
    # bf16 matmul rounding in the pre-scale/crop stages
    assert diff.mean() < 1.0, diff.mean()
    assert np.percentile(diff, 99.5) < 9.0
