"""End-to-end MTCNN cascade parity: our capacity-bounded XLA cascade vs
the reference torch cascade (detect_face.py) on real face images, both
running the SAME published weights.

The two engines differ by design in crop resampling (bilinear vs exact
area) and candidate capping, so parity is measured the way detections
are consumed: every reference detection must be matched by one of ours
with high IoU and close score, and landmark positions must agree to a
couple of pixels.
"""

import glob

import numpy as np
import pytest

from toy_data import toy_face_files

from vn_celeb_face_recognition_tpu.models import MTCNN

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_detect(mtcnn_weight_dir):
    from ref_oracle import load_ref_module

    ref_mtcnn = load_ref_module("mtcnn")
    pnet = ref_mtcnn.PNet()
    rnet = ref_mtcnn.RNet()
    onet = ref_mtcnn.ONet()
    detect_face = load_ref_module("mtcnn_utils.detect_face").detect_face

    def run(img, min_face_size=20):
        with torch.no_grad():
            boxes, points = detect_face(
                img[None], min_face_size, pnet, rnet, onet,
                [0.6, 0.7, 0.7], 0.709, torch.device("cpu"),
            )
        return np.asarray(boxes[0]), np.asarray(points[0])

    return run


def iou(a, b):
    x1 = max(a[0], b[0])
    y1 = max(a[1], b[1])
    x2 = min(a[2], b[2])
    y2 = min(a[3], b[3])
    inter = max(0.0, x2 - x1) * max(0.0, y2 - y1)
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (b[2] - b[0]) * (b[3] - b[1])
    return inter / max(area_a + area_b - inter, 1e-9)


@pytest.mark.slow
def test_cascade_matches_reference_on_faces(ref_detect):
    from PIL import Image

    files = toy_face_files()[:4]
    det = MTCNN(min_face_size=20, keep_all=True)

    matched, total = 0, 0
    for f in files:
        img = np.asarray(
            Image.open(f).convert("RGB").resize((160, 160)),
            dtype=np.uint8,
        )
        ref_boxes, ref_points = ref_detect(img)
        boxes, probs, points = det.detect(img, landmarks=True)
        boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
        points = np.asarray(points, dtype=np.float64).reshape(-1, 5, 2)
        for rb, rp in zip(ref_boxes, ref_points):
            total += 1
            ious = [iou(rb[:4], b) for b in boxes]
            if not ious:
                continue
            j = int(np.argmax(ious))
            if ious[j] > 0.8:
                matched += 1
                # score close
                assert abs(float(probs[j]) - rb[4]) < 0.05
                # landmarks within a few pixels; NMS tie-breaking among
                # saturated-score duplicates can swap near-identical
                # ONet candidates, so bound the mean tightly and the
                # worst point loosely
                err = np.abs(points[j] - rp)
                assert err.mean() < 4.0, err
                assert err.max() < 8.0, err
    assert total > 0
    assert matched == total, f"matched {matched}/{total} reference boxes"
