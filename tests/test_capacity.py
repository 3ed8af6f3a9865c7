"""Capacity-bound stress tests for the MTCNN cascade.

The cascade is shape-static: every stage caps its candidate set by
score (models/mtcnn.py capacity knobs). These tests pin two promises:

1. production caps never silently truncate a crowded frame — every
   face a generous-cap run finds is also found at default caps;
2. when a cap IS hit, the detector warns (the reference could never
   truncate — its torch cascade was fully dynamic,
   /root/reference/models/mtcnn_utils/detect_face.py:70-141).
"""

import numpy as np
import pytest

from vn_celeb_face_recognition_tpu.models import MTCNN


@pytest.fixture(scope="module")
def face_tile():
    import glob

    from PIL import Image

    files = sorted(glob.glob("/root/reference/data/*.png"))
    if not files:
        pytest.skip("reference toy images unavailable")
    return np.asarray(
        Image.open(files[0]).convert("RGB").resize((64, 64)),
        dtype=np.uint8,
    )


@pytest.fixture(scope="module")
def crowded_collage(face_tile):
    """A 6x4 grid of 24 faces on a textured background — the crowded
    case bench.py's 4-face flat-gray frames never exercise."""
    rng = np.random.default_rng(11)
    h, w = 384, 560
    canvas = rng.integers(40, 90, size=(h, w, 3), dtype=np.uint8)
    n = 0
    for r in range(4):
        for c in range(6):
            y = 8 + r * 94
            x = 8 + c * 92
            canvas[y:y + 64, x:x + 64] = face_tile
            n += 1
    assert n == 24
    return canvas


def matched(box, boxes, thr=0.5):
    if len(boxes) == 0:
        return False
    x1 = np.maximum(box[0], boxes[:, 0])
    y1 = np.maximum(box[1], boxes[:, 1])
    x2 = np.minimum(box[2], boxes[:, 2])
    y2 = np.minimum(box[3], boxes[:, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    a = (box[2] - box[0]) * (box[3] - box[1])
    b = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    return bool((inter / np.maximum(a + b - inter, 1e-9) > thr).any())


@pytest.mark.slow
def test_crowded_collage_recall_at_production_caps(crowded_collage):
    """Default (production) caps must keep every detection a
    generous-cap run finds on a 24-face collage."""
    free = MTCNN(
        min_face_size=40, keep_all=True,
        pnet_cap_per_scale=2048, cross_cap=2048, rnet_cap=1024,
        onet_cap=512, out_cap=256,
    )
    free_boxes, free_probs = free.detect(crowded_collage)
    free_boxes = np.asarray(free_boxes, dtype=np.float64).reshape(-1, 4)
    # the published weights find the pasted faces; require a sane floor
    assert len(free_boxes) >= 20

    prod = MTCNN(min_face_size=40, keep_all=True)
    prod_boxes, _ = prod.detect(crowded_collage)
    prod_boxes = np.asarray(prod_boxes, dtype=np.float64).reshape(-1, 4)

    missed = [
        fb for fb in free_boxes if not matched(fb, prod_boxes)
    ]
    assert not missed, (
        "production caps dropped {} of {} faces".format(
            len(missed), len(free_boxes)
        )
    )


@pytest.mark.slow
def test_saturation_warning_fires_when_capped(crowded_collage):
    """Tight caps (bench-style out_cap) on the crowded collage must
    raise the capacity-saturation warning instead of truncating
    silently."""
    tight = MTCNN(min_face_size=40, keep_all=True, out_cap=8)
    with pytest.warns(RuntimeWarning, match="capacity saturated"):
        tight.detect(crowded_collage)


def test_saturation_counts_quiet_on_sparse_frame(face_tile):
    """A frame with one face at default caps must NOT warn."""
    import warnings

    canvas = np.full((160, 160, 3), 70, dtype=np.uint8)
    canvas[48:112, 48:112] = face_tile
    det = MTCNN(min_face_size=40, keep_all=True)
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        det.detect(canvas)


def test_warn_capacity_saturation_reports_stage():
    """Unit check of the host-side comparison logic."""
    det = MTCNN(min_face_size=40, out_cap=4, rnet_cap=16)
    sat = np.array([0, 0, 16, 0, 4], dtype=np.int32)
    with pytest.warns(RuntimeWarning) as rec:
        hit = det.warn_capacity_saturation(sat)
    names = [h[0] for h in hit]
    assert names == ["rnet_cap", "out_cap"]
    assert len(rec) == 2
    assert "rnet_cap=16" in str(rec[0].message)

    quiet = det.warn_capacity_saturation(
        np.array([1, 1, 1, 1, 1], dtype=np.int32)
    )
    assert quiet == []
