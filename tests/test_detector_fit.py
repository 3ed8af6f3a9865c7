"""Detector-fit machinery: synthetic GT, jitted SSD step, npz export.

Pins ``training/detector.py`` plus the flax->torch state_dict export
(``models/torch_convert.flax_to_torch_state_dict``) that
``tools/fit_detector.py`` uses to vendor a trained RetinaFace npz in
the published-checkpoint format (WEIGHTS.md). The reference ships the
train-time box math (retina_face_utils/box_utils.py:96-205) but no
detector trainer — these tests pin the capability it left unwired.
"""

import glob
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from vn_celeb_face_recognition_tpu.models import RetinaFace  # noqa: E402
from vn_celeb_face_recognition_tpu.models.retinaface import (  # noqa: E402
    RetinaFaceNet,
    cfg_mnet,
)
from vn_celeb_face_recognition_tpu.models.torch_convert import (  # noqa: E402
    convert_state_dict,
    flax_to_torch_state_dict,
)
from vn_celeb_face_recognition_tpu.ops import boxes as B  # noqa: E402
from vn_celeb_face_recognition_tpu.training.detector import (  # noqa: E402
    make_detection_train_step,
    synth_batch,
    template_landmarks,
)

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

SIZE = 256  # divisible by every cfg_mnet stride (8/16/32)


def _load_crops():
    from PIL import Image

    files = sorted(glob.glob(os.path.join(ROOT, "data", "*.png")))
    assert files, "vendored face crops missing under data/"
    return [np.asarray(Image.open(f).convert("RGB"), np.uint8)
            for f in files]


def _crop_landmarks(crops):
    return np.stack([template_landmarks(c.shape[0]) for c in crops])


def _init_net(size=SIZE, seed=0):
    net = RetinaFaceNet(backbone=cfg_mnet["name"],
                        out_channel=cfg_mnet["out_channel"],
                        phase="train")
    variables = net.init(jax.random.PRNGKey(seed),
                         jnp.zeros((1, size, size, 3)), train=False)
    return net, variables


def test_flax_torch_roundtrip():
    """convert_state_dict(flax_to_torch_state_dict(v)) == v exactly."""
    _, variables = _init_net(size=128)
    sd = flax_to_torch_state_dict(variables)
    # every exported tensor is torch-keyed numpy
    assert all(isinstance(v, np.ndarray) for v in sd.values())
    rt = convert_state_dict(sd)
    ref_paths = jax.tree_util.tree_structure(variables)
    assert jax.tree_util.tree_structure(rt) == ref_paths
    for a, b in zip(jax.tree_util.tree_leaves(rt),
                    jax.tree_util.tree_leaves(variables)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_synth_batch_ground_truth():
    rng = np.random.default_rng(0)
    crops = _load_crops()
    lms = _crop_landmarks(crops)
    frames, boxes_n, labels, landms_n, valid = synth_batch(
        rng, 4, SIZE, crops, lms, max_faces=3)
    assert frames.shape == (4, SIZE, SIZE, 3) and frames.dtype == np.uint8
    assert boxes_n.shape == (4, 3, 4)
    assert landms_n.shape == (4, 3, 10)
    assert valid.any() and (labels == valid.astype(np.int32)).all()
    # normalised GT: valid boxes inside [0, 1], x2>x1, y2>y1, and the
    # landmarks of a valid face fall inside its box
    for b in range(4):
        for g in np.nonzero(valid[b])[0]:
            x1, y1, x2, y2 = boxes_n[b, g]
            assert 0.0 <= x1 < x2 <= 1.0 and 0.0 <= y1 < y2 <= 1.0
            pts = landms_n[b, g].reshape(5, 2)
            assert (pts[:, 0] >= x1 - 1e-6).all()
            assert (pts[:, 0] <= x2 + 1e-6).all()
            assert (pts[:, 1] >= y1 - 1e-6).all()
            assert (pts[:, 1] <= y2 + 1e-6).all()


def test_detection_train_step_reduces_loss():
    """A few SSD steps on tiny synthetic scenes reduce the loss."""
    rng = np.random.default_rng(1)
    crops = _load_crops()
    lms = _crop_landmarks(crops)
    net, variables = _init_net()
    params, batch_stats = variables["params"], variables["batch_stats"]
    priors = B.make_priors((SIZE, SIZE), cfg_mnet["min_sizes"],
                           cfg_mnet["steps"], cfg_mnet["clip"])
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    step = make_detection_train_step(
        net, priors, tuple(cfg_mnet["variance"]), tx)

    losses0 = None
    for i in range(8):
        frames, boxes_n, labels, landms_n, valid = synth_batch(
            rng, 2, SIZE, crops, lms, max_faces=2, min_px=48, max_px=160)
        params, batch_stats, opt_state, losses = step(
            params, batch_stats, opt_state, jnp.asarray(frames),
            jnp.asarray(boxes_n), jnp.asarray(labels),
            jnp.asarray(landms_n), jnp.asarray(valid))
        losses = jax.device_get(losses)
        assert np.isfinite(losses["loss"])
        if losses0 is None:
            losses0 = losses
    assert losses["loss"] < losses0["loss"]
    # batch stats actually update through the mutable path
    m0 = jax.tree_util.tree_leaves(variables["batch_stats"])[0]
    m1 = jax.tree_util.tree_leaves(batch_stats)[0]
    assert not np.allclose(np.asarray(m0), np.asarray(m1))


def test_exported_npz_loads_into_detector(tmp_path):
    """The torch-keyed npz export loads through RetinaFace's REAL
    published-checkpoint path (strip_prefix + convert_state_dict) and
    the loaded detector reproduces the source variables' outputs."""
    _, variables = _init_net(size=128, seed=3)
    sd = flax_to_torch_state_dict(variables)
    path = tmp_path / "retinaface_fit.npz"
    np.savez_compressed(path, **sd)

    rf = RetinaFace(backbone_cfg="cfg_mnet", weights_path=str(path))
    for a, b in zip(jax.tree_util.tree_leaves(rf.variables),
                    jax.tree_util.tree_leaves(variables)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the detect path runs end-to-end on the loaded tree
    frames = np.full((1, 128, 128, 3), 90, np.uint8)
    boxes, scores, pts, valid = jax.device_get(
        rf._build_detect_fn(1, 128, 128)(rf.variables,
                                         jnp.asarray(frames)))
    assert boxes.shape[0] == 1 and np.isfinite(scores).all()
