"""Parity for the fused pyramid+PNet Pallas path (interpret mode).

Oracle: the cascade's existing stage-1 building blocks —
``pyramid_area_resize`` + ``_normalize`` + ``_fused_pnet_apply`` —
which are themselves pinned against the reference's detect_face.py
PNet loop by tests/test_mtcnn.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vn_celeb_face_recognition_tpu.models.mtcnn import (
    MTCNN,
    _fused_pnet_apply,
    _normalize,
    _space_to_depth2,
)
from vn_celeb_face_recognition_tpu.ops.image import pyramid_area_resize
from vn_celeb_face_recognition_tpu.ops.pyramid_pnet_pallas import (
    _levels,
    phase_pyramid,
    pyramid_pnet,
)

H, W = 159, 214  # odd/even mix so both phase paddings are exercised
SIZES = [(96, 129), (53, 71), (29, 39), (16, 21)]


@pytest.fixture(scope="module")
def setup():
    det = MTCNN(weights_dir=None)  # random-init PNet weights are fine
    gen = np.random.default_rng(3)
    imgs = gen.uniform(0, 255, (2, H, W, 3)).astype(np.float32)
    return det.variables["pnet"], jnp.asarray(imgs)


def test_phase_pyramid_matches_s2d(setup):
    """The phase-split resize equals resize -> normalize -> zero-pad
    -> space-to-depth, level by level, plane by plane."""
    _, imgs = setup
    feed = np.asarray(phase_pyramid(imgs, SIZES, jnp.float32))
    pyr = pyramid_area_resize(imgs, SIZES)
    off = 0
    for (oh, ow), lvl, l in zip(SIZES, pyr, _levels(SIZES)):
        x = _normalize(lvl)
        he, we = 2 * l.oh2, 2 * l.ow2
        x = jnp.pad(x, ((0, 0), (0, he - oh), (0, we - ow), (0, 0)))
        ref = np.asarray(_space_to_depth2(x))  # [B, oh2, ow2, 12]
        got = feed[:, :, off * 128:(off + l.oh2) * 128].reshape(
            2, 12, l.oh2, 128)
        np.testing.assert_allclose(
            got[:, :, :, :l.ow2],
            np.transpose(ref, (0, 3, 1, 2)), rtol=1e-5, atol=1e-5)
        assert np.all(got[:, :, :, l.ow2:] == 0.0)
        off += l.oh2


def test_pyramid_pnet_matches_fused_apply(setup):
    """Full fused path (f32, interpret) == per-level _fused_pnet_apply
    probs/reg maps."""
    pvars, imgs = setup
    results = pyramid_pnet(pvars, imgs, SIZES, dtype=jnp.float32,
                           interpret=True)
    pyr = pyramid_area_resize(imgs, SIZES)
    for lvl, (probs1, reg) in zip(pyr, results):
        ref_reg, ref_probs = _fused_pnet_apply(
            pvars, _normalize(lvl), jnp.float32)
        np.testing.assert_allclose(np.asarray(probs1),
                                   np.asarray(ref_probs[..., 1]),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(reg),
                                   np.asarray(ref_reg),
                                   rtol=1e-4, atol=1e-5)


def test_pyramid_pnet_bf16_close(setup):
    """bf16 feed + bf16 MXU operands stay within the family tolerance
    of the f32 maps (scores are post-sigmoid, so absolute)."""
    pvars, imgs = setup
    f32 = pyramid_pnet(pvars, imgs, SIZES, dtype=jnp.float32,
                       interpret=True)
    bf16 = pyramid_pnet(pvars, imgs, SIZES, dtype=jnp.bfloat16,
                        interpret=True)
    for (p32, r32), (p16, r16) in zip(f32, bf16):
        assert np.abs(np.asarray(p16) - np.asarray(p32)).max() < 0.05
        scale = np.abs(np.asarray(r32)).max() + 1e-3
        assert np.abs(np.asarray(r16) - np.asarray(r32)).max() \
            < 0.08 * scale


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pyramid_pnet_random_shapes(setup, seed):
    """Property check: random frame/level geometries (odd/even mixes,
    tiny tail levels) stay parity-exact with the XLA path."""
    pvars, _ = setup
    gen = np.random.default_rng(100 + seed)
    h = int(gen.integers(40, 190))
    w = int(gen.integers(40, 250))
    imgs = jnp.asarray(gen.uniform(0, 255, (1, h, w, 3))
                       .astype(np.float32))
    sizes = []
    s = 1.0
    while True:
        oh, ow = int(h * s), int(w * s)
        if min(oh, ow) < 14 or len(sizes) >= 5:
            break
        sizes.append((oh, ow))
        s *= float(gen.uniform(0.55, 0.75))
    assert sizes
    results = pyramid_pnet(pvars, imgs, sizes, dtype=jnp.float32,
                           interpret=True)
    pyr = pyramid_area_resize(imgs, sizes)
    for lvl, (probs1, reg) in zip(pyr, results):
        ref_reg, ref_probs = _fused_pnet_apply(
            pvars, _normalize(lvl), jnp.float32)
        np.testing.assert_allclose(np.asarray(probs1),
                                   np.asarray(ref_probs[..., 1]),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(reg),
                                   np.asarray(ref_reg),
                                   rtol=1e-4, atol=1e-5)


def test_supports_gate_wide_levels():
    """Levels wider than one-row-per-128-lanes are rejected — the
    stock min_face_size=20 on 640px frames must fall back to the XLA
    path instead of crashing at kernel build (ow2=193 > 128)."""
    from vn_celeb_face_recognition_tpu.ops.pyramid_pnet_pallas import (
        supports,
    )

    det20 = MTCNN(min_face_size=20)
    sizes = [(int(640 * s + 1), int(640 * s + 1))
             for s in det20._scales(640, 640)]
    assert not supports(sizes)
    det50 = MTCNN(min_face_size=50)
    sizes50 = [(int(640 * s + 1), int(640 * s + 1))
               for s in det50._scales(640, 640)]
    assert supports(sizes50)
    # fused flag + a too-wide FIRST level: the hybrid split must run
    # the wide level through XLA and the narrow tail through the
    # kernel, matching the default path's detections
    gen = np.random.default_rng(9)
    img = gen.uniform(0, 255, (256, 258, 3)).astype(np.float32)
    img[60:170, 80:200] = np.linspace(45, 210, 110)[:, None, None]
    kw = dict(min_face_size=12, out_cap=8, keep_all=True)
    det = MTCNN(fused_pyramid_pnet=True, **kw)
    szs = [(int(256 * s + 1), int(258 * s + 1))
           for s in det._scales(256, 258)]
    assert not supports(szs[:1]) and supports(szs[1:2])
    b_hyb, p_hyb = det.detect(img)
    b_def, p_def = MTCNN(**kw).detect(img)
    np.testing.assert_allclose(
        np.asarray(b_hyb, np.float32), np.asarray(b_def, np.float32),
        rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(
        np.asarray(p_hyb, np.float32), np.asarray(p_def, np.float32),
        rtol=1e-3, atol=1e-3)


def test_detector_fused_pyramid_pnet_matches_default():
    """MTCNN(fused_pyramid_pnet=True) returns the same detections as
    the default stage-1 path on a synthetic face-bearing frame."""
    gen = np.random.default_rng(7)
    img = gen.uniform(0, 255, (250, 310, 3)).astype(np.float32)
    # paste a bright blob so at least the box chain has work
    img[60:180, 90:210] = np.linspace(40, 215, 120)[:, None, None]
    kw = dict(min_face_size=40, keep_all=True, out_cap=16)
    base = MTCNN(**kw)
    fused = MTCNN(fused_pyramid_pnet=True, **kw)
    b1, p1 = base.detect(img)
    b2, p2 = fused.detect(img)
    np.testing.assert_allclose(
        np.asarray(b1, np.float32), np.asarray(b2, np.float32),
        rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(
        np.asarray(p1, np.float32), np.asarray(p2, np.float32),
        rtol=1e-3, atol=1e-3)
