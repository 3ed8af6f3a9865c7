"""Parity for the fused RNet/ONet trunks (interpret mode).

Oracle: the flax RNet/ONet modules, themselves pinned against the
reference's torch nets by tests/test_mtcnn_nets_parity.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vn_celeb_face_recognition_tpu.models.mtcnn import (
    MTCNN,
    _normalize,
)
from vn_celeb_face_recognition_tpu.ops.crops_net_pallas import (
    ONET_SPEC,
    RNET_SPEC,
    onet_apply_fused,
    rnet_apply_fused,
)


@pytest.fixture(scope="module")
def setup():
    det = MTCNN(weights_dir=None)  # vendored published weights
    gen = np.random.default_rng(11)
    r24 = _normalize(gen.uniform(0, 255, (16, 24, 24, 3))
                     .astype(np.float32))
    o48 = _normalize(gen.uniform(0, 255, (8, 48, 48, 3))
                     .astype(np.float32))
    return det, jnp.asarray(r24), jnp.asarray(o48)


def test_rnet_fused_matches_flax_f32(setup):
    det, r24, _ = setup
    reg, prob = rnet_apply_fused(det.variables["rnet"], r24,
                                 dtype=jnp.float32, interpret=True)
    ref_reg, ref_prob = det.rnet.apply(det.variables["rnet"], r24)
    np.testing.assert_allclose(np.asarray(reg), np.asarray(ref_reg),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(prob), np.asarray(ref_prob),
                               rtol=1e-4, atol=1e-5)


def test_onet_fused_matches_flax_f32(setup):
    det, _, o48 = setup
    reg, lm, prob = onet_apply_fused(det.variables["onet"], o48,
                                     dtype=jnp.float32, interpret=True)
    ref_reg, ref_lm, ref_prob = det.onet.apply(det.variables["onet"],
                                               o48)
    np.testing.assert_allclose(np.asarray(reg), np.asarray(ref_reg),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lm), np.asarray(ref_lm),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(prob), np.asarray(ref_prob),
                               rtol=1e-4, atol=1e-5)


def test_rnet_fused_bf16_close(setup):
    """bf16 trunk scores stay within the family tolerance (probs are
    post-softmax, absolute)."""
    det, r24, _ = setup
    _, p32 = rnet_apply_fused(det.variables["rnet"], r24,
                              dtype=jnp.float32, interpret=True)
    _, p16 = rnet_apply_fused(det.variables["rnet"], r24,
                              dtype=jnp.bfloat16, interpret=True)
    assert np.abs(np.asarray(p16) - np.asarray(p32)).max() < 0.05


def test_detector_fused_crop_nets_matches_default():
    """MTCNN(fused_crop_nets=True) returns the same detections as the
    default RNet/ONet path on a synthetic frame (interpret on CPU)."""
    gen = np.random.default_rng(5)
    img = gen.uniform(0, 255, (220, 260, 3)).astype(np.float32)
    img[50:160, 70:190] = np.linspace(35, 220, 110)[:, None, None]
    kw = dict(min_face_size=40, keep_all=True, out_cap=16)
    base = MTCNN(**kw)
    fused = MTCNN(fused_crop_nets=True, **kw)
    b1, p1 = base.detect(img)
    b2, p2 = fused.detect(img)
    np.testing.assert_allclose(
        np.asarray(b1, np.float32), np.asarray(b2, np.float32),
        rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(
        np.asarray(p1, np.float32), np.asarray(p2, np.float32),
        rtol=1e-3, atol=1e-3)


def test_specs():
    assert (RNET_SPEC.pg, RNET_SPEC.c2_out) == (11, 9)
    assert (ONET_SPEC.pg, ONET_SPEC.c2_out) == (23, 21)
    assert RNET_SPEC.edge_subs == (2,)
    assert ONET_SPEC.edge_subs == (2,)
