"""Unit tests for box math + masked NMS against independent NumPy
implementations of the published algorithms (greedy NMS per the Fast
R-CNN lineage; SSD encode/decode per the variance formulas)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vn_celeb_face_recognition_tpu.ops import boxes as B


def ref_greedy_nms(boxes, scores, thr, offset=0.0, min_mode=False):
    """Straightforward NumPy greedy NMS used as a test oracle."""
    order = np.argsort(-scores, kind="stable")
    keep = np.zeros(len(boxes), dtype=bool)
    areas = (boxes[:, 2] - boxes[:, 0] + offset) * (
        boxes[:, 3] - boxes[:, 1] + offset
    )
    for i in order:
        ok = True
        for j in np.nonzero(keep)[0]:
            x1 = max(boxes[i, 0], boxes[j, 0])
            y1 = max(boxes[i, 1], boxes[j, 1])
            x2 = min(boxes[i, 2], boxes[j, 2])
            y2 = min(boxes[i, 3], boxes[j, 3])
            w = max(0.0, x2 - x1 + offset)
            h = max(0.0, y2 - y1 + offset)
            inter = w * h
            if min_mode:
                o = inter / min(areas[i], areas[j])
            else:
                o = inter / (areas[i] + areas[j] - inter)
            if o > thr:
                ok = False
                break
        keep[i] = ok
    return keep


def random_boxes(gen, n, size=100.0):
    xy = gen.uniform(0, size, size=(n, 2))
    wh = gen.uniform(5, 40, size=(n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


@pytest.mark.parametrize("offset,min_mode", [(0.0, False), (1.0, False),
                                             (1.0, True)])
def test_nms_matches_reference(rng, offset, min_mode):
    boxes = random_boxes(rng, 64)
    scores = rng.uniform(0.1, 1.0, size=64).astype(np.float32)
    valid = np.ones(64, dtype=bool)
    keep = np.asarray(
        B.nms_keep_mask(jnp.asarray(boxes), jnp.asarray(scores),
                        jnp.asarray(valid), 0.5, offset=offset,
                        min_mode=min_mode)
    )
    expected = ref_greedy_nms(boxes, scores, 0.5, offset, min_mode)
    assert (keep == expected).all()


def test_nms_respects_validity(rng):
    boxes = random_boxes(rng, 32)
    scores = rng.uniform(0.1, 1.0, size=32).astype(np.float32)
    valid = rng.uniform(size=32) > 0.5
    keep = np.asarray(
        B.nms_keep_mask(jnp.asarray(boxes), jnp.asarray(scores),
                        jnp.asarray(valid), 0.5)
    )
    assert not keep[~valid].any()
    expected = ref_greedy_nms(boxes[valid], scores[valid], 0.5)
    assert (keep[valid] == expected).all()


def test_pairwise_iou_identity(rng):
    boxes = random_boxes(rng, 10)
    iou = np.asarray(B.pairwise_iou(jnp.asarray(boxes), jnp.asarray(boxes)))
    assert np.allclose(np.diag(iou), 1.0, atol=1e-5)


def test_make_priors_matches_loop_reference():
    """Vectorised prior generation vs the published itertools algorithm
    (cell-major, min_size-minor ordering, reference prior_box.py)."""
    import math
    from itertools import product

    image_size = (64, 96)
    min_sizes = [[16, 32], [64, 128], [256, 512]]
    steps = [8, 16, 32]
    anchors = []
    for k, step in enumerate(steps):
        f = [math.ceil(image_size[0] / step), math.ceil(image_size[1] / step)]
        for i, j in product(range(f[0]), range(f[1])):
            for ms in min_sizes[k]:
                s_kx = ms / image_size[1]
                s_ky = ms / image_size[0]
                cx = (j + 0.5) * step / image_size[1]
                cy = (i + 0.5) * step / image_size[0]
                anchors.append([cx, cy, s_kx, s_ky])
    expected = np.array(anchors, dtype=np.float32)
    got = B.make_priors(image_size, min_sizes, steps)
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_encode_decode_roundtrip(rng):
    priors = B.make_priors((64, 64), [[16, 32], [64, 128], [256, 512]],
                           [8, 16, 32])
    n = priors.shape[0]
    gt = random_boxes(rng, n, size=1.0) / 100.0
    variances = (0.1, 0.2)
    enc = B.encode_boxes(jnp.asarray(gt), jnp.asarray(priors), variances)
    dec = B.decode_boxes(enc, jnp.asarray(priors), variances)
    np.testing.assert_allclose(np.asarray(dec), gt, atol=1e-4)


def test_landmark_encode_decode_roundtrip(rng):
    priors = B.make_priors((64, 64), [[16, 32]], [8])
    n = priors.shape[0]
    pts = rng.uniform(0, 1, size=(n, 10)).astype(np.float32)
    variances = (0.1, 0.2)
    enc = B.encode_landmarks(jnp.asarray(pts), jnp.asarray(priors),
                             variances)
    dec = B.decode_landmarks(enc, jnp.asarray(priors), variances)
    np.testing.assert_allclose(np.asarray(dec), pts, atol=1e-4)


def test_rerec_produces_squares(rng):
    boxes = random_boxes(rng, 16)
    sq = np.asarray(B.rerec(jnp.asarray(boxes)))
    w = sq[:, 2] - sq[:, 0]
    h = sq[:, 3] - sq[:, 1]
    np.testing.assert_allclose(w, h, atol=1e-4)
    np.testing.assert_allclose(
        (sq[:, 0] + sq[:, 2]) / 2, (boxes[:, 0] + boxes[:, 2]) / 2,
        atol=1e-4,
    )


def test_bbreg_plus_one_convention():
    boxes = jnp.asarray([[10.0, 10.0, 20.0, 30.0]])
    reg = jnp.asarray([[0.1, 0.1, -0.1, -0.1]])
    out = np.asarray(B.bbreg(boxes, reg))[0]
    # w = 11, h = 21 under the +1 convention
    np.testing.assert_allclose(
        out, [10 + 1.1, 10 + 2.1, 20 - 1.1, 30 - 2.1], atol=1e-5
    )


def test_top_k_select(rng):
    values = jnp.asarray(rng.normal(size=32).astype(np.float32))
    mask = jnp.asarray(rng.uniform(size=32) > 0.3)
    idx, valid = B.top_k_select(values, mask, 8)
    got = np.asarray(values)[np.asarray(idx)][np.asarray(valid)]
    expected = np.sort(np.asarray(values)[np.asarray(mask)])[::-1][:8][
        : int(np.asarray(valid).sum())
    ]
    np.testing.assert_allclose(np.sort(got)[::-1], expected, atol=1e-6)
