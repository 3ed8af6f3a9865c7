"""facenet_aug_batch (gather-free batched aug) vs the exact per-image
composite: identical geometry parameters -> near-identical images.

The batched path folds rotate(+-10) + pad-2-crop into one similarity
map per image and warps through ops/warp_fast (3-shear + hat matmuls);
the exact path applies warp_affine with the SAME folded matrix. The
only difference is the shear chain's documented bilinear softness —
bounded here like tests/test_warp_fast.py bounds the align path.

NOTE: facenet_aug_batch (the Pallas-warp route) was measured and
REJECTED for the training hot path (559 vs 171 ms/step on the v5e —
see its docstring); these tests pin the rejected kernel's semantics so
the negative result stays honest. The SHIPPED transform_facenet_aug is
facenet_aug_shear (3 select_n shear passes in plain XLA, 44.3 ms/step
incl. encoder+update), parity-tested below against the same exact
composite.
"""

import numpy as np

import jax
import jax.numpy as jnp

from vn_celeb_face_recognition_tpu.ops import augment as A
from vn_celeb_face_recognition_tpu.ops.image import (
    fixed_image_standardization,
    warp_affine,
)
from vn_celeb_face_recognition_tpu.ops.warp_fast import (
    batched_similarity_warp,
)


def smooth_batch(rng, b=4, n=112):
    base = rng.uniform(0, 255, (b, n // 8, n // 8, 3))
    img = np.stack(
        [
            np.stack(
                [np.kron(base[i, ..., c], np.ones((8, 8)))
                 for c in range(3)],
                -1,
            )
            for i in range(b)
        ]
    )
    from scipy.signal import convolve2d

    k = np.ones((5, 5)) / 25.0
    img = np.stack(
        [
            np.stack(
                [convolve2d(img[i, ..., c], k, mode="same")
                 for c in range(3)],
                -1,
            )
            for i in range(b)
        ]
    )
    return img.astype(np.float32)


def test_params_fold_matches_sequential_exact_warp():
    """The folded similarity matrix == rotate-then-pad-crop, pinned
    with the EXACT warp on both sides (pure geometry check)."""
    rng = np.random.default_rng(0)
    imgs = smooth_batch(rng, b=6)
    b, h, w, _ = imgs.shape
    mats, _, offs = A._facenet_aug_params(
        jax.random.PRNGKey(3), b, h, w, h
    )
    mats, offs = np.asarray(mats), np.asarray(offs)
    for i in range(b):
        folded = np.asarray(
            warp_affine(jnp.asarray(imgs[i]), jnp.asarray(mats[i]),
                        (h, w))
        )
        oy, ox = int(offs[i, 0]), int(offs[i, 1])
        # zero the pad band (the folded warp samples real pixels where
        # the sequential crop sees the 2px zero pad; facenet_aug_batch
        # masks it the same way)
        ys = np.arange(h)
        m = ((ys + oy >= 0) & (ys + oy < h))[:, None] & (
            (ys + ox >= 0) & (ys + ox < w)
        )[None, :]
        folded = np.where(m[..., None], folded, 0.0)
        cos, msin, _ = mats[i][0]
        sin = mats[i][1][0]
        cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
        m_rot = np.array(
            [[cos, msin, cx - cos * cx + sin * cy],
             [sin, cos, cy - sin * cx - cos * cy]],
            np.float32,
        )
        rot = np.asarray(
            warp_affine(jnp.asarray(imgs[i]), jnp.asarray(m_rot),
                        (h, w))
        )
        padded = np.pad(rot, ((2, 2), (2, 2), (0, 0)))
        seq = padded[oy + 2:oy + 2 + h, ox + 2:ox + 2 + w]
        np.testing.assert_allclose(folded, seq, atol=1e-2)


def test_batched_aug_matches_exact_composite():
    """Full facenet_aug_batch vs warp_affine with identical params."""
    rng = np.random.default_rng(1)
    imgs = smooth_batch(rng, b=8)
    b, h, w, _ = imgs.shape
    key = jax.random.PRNGKey(7)
    got = np.asarray(A.facenet_aug_batch(key, jnp.asarray(imgs)))

    mats, flip, offs = A._facenet_aug_params(key, b, h, w, h)
    mats, flip = np.asarray(mats), np.asarray(flip)
    offs = np.asarray(offs)
    for i in range(b):
        ref = np.asarray(
            warp_affine(jnp.asarray(imgs[i]), jnp.asarray(mats[i]),
                        (h, w))
        )
        oy, ox = int(offs[i, 0]), int(offs[i, 1])
        ys = np.arange(h)
        m = ((ys + oy >= 0) & (ys + oy < h))[:, None] & (
            (ys + ox >= 0) & (ys + ox < w)
        )[None, :]
        ref = np.where(m[..., None], ref, 0.0)
        if flip[i]:
            ref = ref[:, ::-1]
        ref = np.asarray(fixed_image_standardization(jnp.asarray(ref)))
        d = np.abs(got[i] - ref) * 128.0  # back to pixel units
        assert d.mean() < 1.5
        assert np.percentile(d, 99) < 10.0


def test_batched_aug_identity_params_is_fix_std():
    """Zero rotation + centre crop + no flip must reproduce the input
    through the warp exactly (hat matrices become identity)."""
    rng = np.random.default_rng(2)
    imgs = smooth_batch(rng, b=2)
    b, h, w, _ = imgs.shape
    eye = jnp.tile(
        jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])[None],
        (b, 1, 1),
    )
    out = np.asarray(batched_similarity_warp(jnp.asarray(imgs), eye, h))
    np.testing.assert_allclose(out, imgs, atol=1e-2)


def test_batched_aug_distribution_sanity():
    """Output is standardised ((x-127.5)/128) and flips/crops vary."""
    rng = np.random.default_rng(3)
    imgs = smooth_batch(rng, b=16)
    out = np.asarray(
        A.facenet_aug_batch(jax.random.PRNGKey(11), jnp.asarray(imgs))
    )
    assert out.shape == imgs.shape
    assert np.abs(out).max() <= 1.0 + 1e-5
    # different images get different geometry (mats differ)
    mats, flip, _ = A._facenet_aug_params(
        jax.random.PRNGKey(11), 16, 112, 112, 112
    )
    assert len(np.unique(np.asarray(mats)[:, 0, 2])) > 4
    assert 0 < int(np.asarray(flip).sum()) < 16


def test_facenet_aug_shear_matches_exact_composite():
    """facenet_aug_shear (the training hot path: 3-shear rotation in
    plain XLA) vs the exact per-image composite with identical
    sampled parameters — bounded like the align path's shear chain."""
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    imgs = smooth_batch(rng, b=8)
    b, h, w, _ = imgs.shape
    key = jax.random.PRNGKey(13)
    got = np.asarray(A.facenet_aug_shear(key, jnp.asarray(imgs)))
    assert got.shape == imgs.shape

    # replay the same parameter draws (same key-split structure)
    k_rot, k_crop, k_flip = jax.random.split(key, 3)
    deg = np.asarray(jax.random.uniform(k_rot, (b,), minval=-10.0,
                                        maxval=10.0))
    k1, k2 = jax.random.split(k_crop)
    y0 = np.asarray(jax.random.randint(k1, (b,), 0, 5))
    x0 = np.asarray(jax.random.randint(k2, (b,), 0, 5))
    flip = np.asarray(jax.random.bernoulli(k_flip, 0.5, (b,)))

    from vn_celeb_face_recognition_tpu.ops.image import warp_affine

    for i in range(b):
        rad = np.deg2rad(deg[i])
        cs, sn = np.cos(rad), np.sin(rad)
        cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
        m = np.array([[cs, -sn, cx - cs * cx + sn * cy],
                      [sn, cs, cy - sn * cx - cs * cy]], np.float32)
        rot = np.asarray(warp_affine(jnp.asarray(imgs[i]),
                                     jnp.asarray(m), (h, w)))
        padded = np.pad(rot, ((2, 2), (2, 2), (0, 0)))
        ref = padded[y0[i]:y0[i] + h, x0[i]:x0[i] + w]
        if flip[i]:
            ref = ref[:, ::-1]
        ref = np.asarray(fixed_image_standardization(jnp.asarray(ref)))
        d = np.abs(got[i] - ref) * 128.0  # back to pixel units
        assert d.mean() < 1.0, d.mean()
        assert np.percentile(d, 99) < 10.0


def test_facenet_aug_shear_distribution_sanity():
    rng = np.random.default_rng(6)
    imgs = smooth_batch(rng, b=16)
    out = np.asarray(
        A.facenet_aug_shear(jax.random.PRNGKey(3), jnp.asarray(imgs)))
    assert out.shape == imgs.shape
    assert np.abs(out).max() <= 1.0 + 1e-5
    outs2 = np.asarray(
        A.facenet_aug_shear(jax.random.PRNGKey(4), jnp.asarray(imgs)))
    assert np.abs(out - outs2).max() > 1e-3  # keys change geometry
