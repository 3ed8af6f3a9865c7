"""Plane-major MobileNet stage-1 matches the NHWC flax modules.

The planar forward (ops/planar_mnet.py) must be numerically the same
function as MobileNetV1Stage's stage-1 graph — same checkpoint tree in,
same activations out (float-reassociation tolerance) — so the
RetinaFace trunk can switch layouts freely.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vn_celeb_face_recognition_tpu.models.retinaface import (
    MobileNetV1Stage,
)
from vn_celeb_face_recognition_tpu.ops.planar_mnet import (
    _STAGE1_SPECS,
    planar_stage1,
)

SUB = (104.0, 117.0, 123.0)


def _stage1_module(dtype=None):
    return MobileNetV1Stage(_STAGE1_SPECS, dtype=dtype)


@pytest.fixture(scope="module")
def stage1_setup():
    mod = _stage1_module()
    key = jax.random.PRNGKey(0)
    variables = mod.init(key, jnp.zeros((1, 64, 64, 3)))
    # non-trivial BN stats so the folding is actually exercised
    stats = jax.tree_util.tree_map(
        lambda a: a + jax.random.uniform(
            jax.random.PRNGKey(1), a.shape, minval=0.05, maxval=0.4),
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": stats}
    gen = np.random.default_rng(2)
    imgs = gen.integers(0, 255, size=(2, 64, 64, 3), dtype=np.uint8)
    return mod, variables, imgs


def test_planar_stage1_matches_nhwc_f32(stage1_setup):
    mod, variables, imgs = stage1_setup
    x = imgs.astype(np.float32) - np.asarray(SUB, np.float32)
    ref = mod.apply(variables, jnp.asarray(x), train=False)
    out = planar_stage1(variables["params"], variables["batch_stats"],
                        jnp.asarray(imgs), SUB, dtype=None)
    assert out.shape == ref.shape  # [2, 8, 8, 64]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_planar_stage1_bf16_close_to_f32(stage1_setup):
    _, variables, imgs = stage1_setup
    f32 = planar_stage1(variables["params"], variables["batch_stats"],
                        jnp.asarray(imgs), SUB, dtype=None)
    bf16 = planar_stage1(variables["params"], variables["batch_stats"],
                         jnp.asarray(imgs), SUB, dtype=jnp.bfloat16)
    assert bf16.dtype == jnp.bfloat16
    ref = np.asarray(f32)
    got = np.asarray(bf16, np.float32)
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() < 0.05 * scale


def test_from_s1_net_matches_full_net():
    """planar_stage1 + RetinaFaceNetFromS1 on ONE checkpoint tree must
    reproduce the full RetinaFaceNet head outputs — the from-s1 graph
    addresses body/stage2..3 + fpn/ssh/heads at the same param paths."""
    from vn_celeb_face_recognition_tpu.models.retinaface import (
        RetinaFaceNet,
        RetinaFaceNetFromS1,
    )

    full = RetinaFaceNet(backbone="mobilenet0.25", out_channel=64,
                         phase="test")
    variables = full.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 64, 64, 3)), train=False)
    gen = np.random.default_rng(4)
    imgs = gen.integers(0, 255, size=(2, 64, 64, 3), dtype=np.uint8)
    x = imgs.astype(np.float32) - np.asarray(SUB, np.float32)
    ref_loc, ref_conf, ref_ldm = full.apply(variables, jnp.asarray(x),
                                            train=False)

    s1 = planar_stage1(variables["params"]["body"]["stage1"],
                       variables["batch_stats"]["body"]["stage1"],
                       jnp.asarray(imgs), SUB, dtype=None)
    tail = RetinaFaceNetFromS1(out_channel=64, phase="test")
    loc, conf, ldm = tail.apply(variables, s1, train=False)
    for got, ref in ((loc, ref_loc), (conf, ref_conf), (ldm, ref_ldm)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)


def test_pallas_stage1_matches_planar(stage1_setup):
    """The fused Pallas kernel (interpret mode on CPU) reproduces the
    XLA planar path — same folded weights, same activations out."""
    from vn_celeb_face_recognition_tpu.ops.planar_s1_pallas import (
        planar_stage1_pallas,
        supports,
    )

    _, variables, imgs = stage1_setup
    assert supports(64, 64) and not supports(72, 104)
    ref = planar_stage1(variables["params"], variables["batch_stats"],
                        jnp.asarray(imgs), SUB, dtype=None)
    out = planar_stage1_pallas(
        variables["params"], variables["batch_stats"],
        jnp.asarray(imgs), SUB, dtype=None, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_pallas_stage1_bf16_interpret(stage1_setup):
    from vn_celeb_face_recognition_tpu.ops.planar_s1_pallas import (
        planar_stage1_pallas,
    )

    _, variables, imgs = stage1_setup
    f32 = planar_stage1(variables["params"], variables["batch_stats"],
                        jnp.asarray(imgs), SUB, dtype=None)
    out = planar_stage1_pallas(
        variables["params"], variables["batch_stats"],
        jnp.asarray(imgs), SUB, dtype=jnp.bfloat16, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = np.asarray(f32)
    got = np.asarray(out, np.float32)
    assert np.abs(got - ref).max() < 0.05 * np.abs(ref).max()


def test_pallas_stage1_multi_band(stage1_setup):
    """A size whose segment-1 row count exceeds one band (208 px ->
    104 rows -> 2 bands) exercises the halo/edge-band paths."""
    from vn_celeb_face_recognition_tpu.ops.planar_s1_pallas import (
        planar_stage1_pallas,
    )

    _, variables, _ = stage1_setup
    gen = np.random.default_rng(5)
    imgs = gen.integers(0, 255, size=(1, 208, 208, 3), dtype=np.uint8)
    ref = planar_stage1(variables["params"], variables["batch_stats"],
                        jnp.asarray(imgs), SUB, dtype=None)
    out = planar_stage1_pallas(
        variables["params"], variables["batch_stats"],
        jnp.asarray(imgs), SUB, dtype=None, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_pallas_v2_stage1_matches_planar(stage1_setup):
    """The v2 kernels (DMA halo windows + aligned-slice taps,
    interpret mode on CPU) reproduce the XLA planar path."""
    from vn_celeb_face_recognition_tpu.ops.planar_s1_pallas_v2 import (
        planar_stage1_pallas_v2,
        supports,
    )

    _, variables, imgs = stage1_setup
    assert supports(64, 64) and not supports(72, 104)
    ref = planar_stage1(variables["params"], variables["batch_stats"],
                        jnp.asarray(imgs), SUB, dtype=None)
    out = planar_stage1_pallas_v2(
        variables["params"], variables["batch_stats"],
        jnp.asarray(imgs), SUB, dtype=None, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_pallas_v2_stage1_multi_band_bf16(stage1_setup):
    """Multi-band non-square size exercises the DMA halo windows and
    edge-band phantom rows; bf16 stays within the family tolerance."""
    from vn_celeb_face_recognition_tpu.ops.planar_s1_pallas_v2 import (
        planar_stage1_pallas_v2,
    )

    _, variables, _ = stage1_setup
    gen = np.random.default_rng(5)
    imgs = gen.integers(0, 255, size=(1, 208, 320, 3), dtype=np.uint8)
    ref = planar_stage1(variables["params"], variables["batch_stats"],
                        jnp.asarray(imgs), SUB, dtype=None)
    out = planar_stage1_pallas_v2(
        variables["params"], variables["batch_stats"],
        jnp.asarray(imgs), SUB, dtype=None, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    bf16 = planar_stage1_pallas_v2(
        variables["params"], variables["batch_stats"],
        jnp.asarray(imgs), SUB, dtype=jnp.bfloat16, interpret=True)
    assert bf16.dtype == jnp.bfloat16
    got = np.asarray(bf16, np.float32)
    refn = np.asarray(ref)
    assert np.abs(got - refn).max() < 0.05 * np.abs(refn).max()


def test_detector_pallas_stage1_matches_default():
    """RetinaFace(planar_stage1='pallas') returns the same detections
    as the NHWC default on the same random variables (the kernel path
    runs through the interpreter on CPU)."""
    from vn_celeb_face_recognition_tpu.models.retinaface import (
        RetinaFace,
    )

    base = RetinaFace(backbone_cfg="cfg_mnet", nms_cap=64,
                      vis_thres=0.02)
    fast = RetinaFace(backbone_cfg="cfg_mnet", nms_cap=64,
                      vis_thres=0.02, planar_stage1="pallas")
    fast.variables = base.variables
    gen = np.random.default_rng(6)
    img = gen.integers(0, 255, size=(96, 96, 3), dtype=np.uint8)
    ref_d, ref_s, _ = base.inference([img], landmark=True)
    got_d, got_s, _ = fast.inference([img], landmark=True)
    assert len(got_d[0]) == len(ref_d[0]) > 0
    np.testing.assert_allclose(got_s[0], ref_s[0], rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(got_d[0], ref_d[0], rtol=1e-3,
                               atol=5e-2)


def test_planar_stage1_odd_input_sizes(stage1_setup):
    """Non-multiple-of-16 inputs keep exact conv output-size semantics."""
    mod, variables, _ = stage1_setup
    gen = np.random.default_rng(3)
    imgs = gen.integers(0, 255, size=(1, 72, 104, 3), dtype=np.uint8)
    x = imgs.astype(np.float32) - np.asarray(SUB, np.float32)
    ref = mod.apply(variables, jnp.asarray(x), train=False)
    out = planar_stage1(variables["params"], variables["batch_stats"],
                        jnp.asarray(imgs), SUB, dtype=None)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_packed_stage1_matches_nhwc(stage1_setup):
    """Batch-to-lane packed stage 1 == the flax NHWC stage (f32)."""
    from vn_celeb_face_recognition_tpu.ops.packed_mnet import (
        packed_stage1, pick_groups,
    )
    mod, variables, imgs = stage1_setup
    # widen the batch so a non-trivial group count is exercised
    imgs8 = np.concatenate([imgs] * 4, axis=0)  # [8, 64, 64, 3]
    assert pick_groups(8) == 8
    x = imgs8.astype(np.float32) - np.asarray(SUB, np.float32)
    ref = mod.apply(variables, jnp.asarray(x), train=False)
    out = packed_stage1(variables["params"], variables["batch_stats"],
                        jnp.asarray(imgs8), SUB, dtype=None)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    # a group count that does not divide into the lane target evenly
    out3 = packed_stage1(variables["params"], variables["batch_stats"],
                         jnp.asarray(imgs8[:6]), SUB, dtype=None,
                         groups=3)
    np.testing.assert_allclose(np.asarray(out3), np.asarray(ref[:6]),
                               rtol=2e-4, atol=2e-4)
