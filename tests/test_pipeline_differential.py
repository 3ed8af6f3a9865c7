"""Full-pipeline differential: this repo's demo_video + statistic
exporter vs the REFERENCE pipeline's actual output on the same toy
video with shared weights.

The reference side runs in a subprocess (tests/ref_video_driver.py):
its real demo_video.main par_fd_vs_aln loop (MTCNN -> align ->
InceptionResnetV1 -> MLP -> emotion -> tracker.csv rows,
/root/reference/demo_video.py:86-192) and its statistic exporter
(/root/reference/celeb_statistic.py:32-107) — the one reference oracle
previous rounds never spent. Weights are shared: published MTCNN both
sides, a seeded random torch encoder converted for the repo side, an
MLP trained by the driver on the reference pipeline's own embeddings
(large margins -> name decisions robust to float-level pipeline
differences), and a bias-staggered emotion head (deterministic top-k;
the emotion net's numerics are covered by test_emotion_parity).

Asserted agreement, row by row:
  * Time and Frame_idx exact;
  * Names exactly equal (same faces found, same celebrities);
  * normalized Bboxes within a small tolerance (the two cascades
    differ by design in crop resampling — see
    test_mtcnn_cascade_parity);
  * Emotion tag lists exactly equal;
and tracker.json equality (intervals, celebrity sets, per-appearance
time/emotions exact, bboxes within the same tolerance).
"""

import ast
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from ref_video_driver import NUM_CLASSES, frame_label
from toy_data import toy_face_files

pytest.importorskip("torch")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# NOT a multiple of CHUNK: a frame count divisible by n_frames crashes
# the REFERENCE loop on its empty end-of-video chunk (np.stack([]) in
# its MTCNN detect, demo_video.py:86-99) — a latent upstream bug this
# oracle has to drive around; the ragged 4-frame tail also exercises
# both pipelines' tail-chunk handling.
N_FRAMES_TOTAL = 20
CHUNK = 8
N_INTERVALS = 3
N_APPEAR = 3
BBOX_ATOL = 0.05  # normalized coords; cascades differ in resampling


def _build_toy_video(workdir, face_files):
    import cv2
    from PIL import Image

    crops = [
        np.asarray(
            Image.open(f).convert("RGB").resize((80, 80)), dtype=np.uint8
        )
        for f in face_files[:NUM_CLASSES]
    ]
    path = os.path.join(workdir, "toy.avi")
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"MJPG"), 10, (160, 160)
    )
    for i in range(N_FRAMES_TOTAL):
        frame = np.full((160, 160, 3), 80, np.uint8)
        off = (i * 3) % 40
        face = crops[frame_label(i)]
        frame[30:110, 20 + off:100 + off] = face[:, :, ::-1]  # BGR
        writer.write(frame)
    writer.release()
    return path


def _rows(csv_path):
    import pandas as pd

    return pd.read_csv(csv_path)


@pytest.mark.slow
def test_video_pipeline_matches_reference(tmp_path_factory):
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference checkout unavailable")
    face_files = toy_face_files()
    if len(face_files) < NUM_CLASSES:
        pytest.skip("toy face fixture unavailable")
    workdir = str(tmp_path_factory.mktemp("pipeline_diff"))

    _build_toy_video(workdir, face_files)
    with open(os.path.join(workdir, "label2name.csv"), "w") as fh:
        fh.write("label,name\n")
        for i in range(NUM_CLASSES):
            fh.write(f"{i},Celeb{i:02d}\n")

    # ---- reference side (subprocess; writes shared weights too) -----
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "tests",
                                      "ref_video_driver.py"),
         "--workdir", workdir, "--n_frames", str(CHUNK),
         "--n_intervals", str(N_INTERVALS),
         "--n_appear", str(N_APPEAR)],
        capture_output=True, text=True, timeout=1800,
    )
    assert proc.returncode == 0, (
        f"reference driver failed\nstdout:\n{proc.stdout[-3000:]}\n"
        f"stderr:\n{proc.stderr[-3000:]}"
    )
    ref_csv = os.path.join(workdir, "ref_tracker.csv")
    assert os.path.exists(ref_csv)

    # ---- repo side (the real CLI, same shared weights) --------------
    eargs = {"pretrained": "vggface2",
             "weights_path": os.path.join(workdir, "enc.pt")}
    with open(os.path.join(workdir, "eargs.json"), "w") as fh:
        json.dump(eargs, fh)
    emtargs = {"pretrained": False, "num_classes": 690,
               "checkpoint_path": os.path.join(workdir, "emo.pth")}
    with open(os.path.join(workdir, "emtargs.json"), "w") as fh:
        json.dump(emtargs, fh)
    our_csv = os.path.join(workdir, "our_tracker.csv")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "demo_video.py"),
         "-i", os.path.join(workdir, "toy.avi"),
         "-m", os.path.join(workdir, "model_best.pth"),
         "-l2n", os.path.join(workdir, "label2name.csv"),
         "-nc", str(NUM_CLASSES),
         "-enc", "InceptionResnetV1",
         "-eargs", os.path.join(workdir, "eargs.json"),
         "-emtargs", os.path.join(workdir, "emtargs.json"),
         "-t2i", os.path.join(REPO_ROOT, "meta_data",
                              "emotion_recognition", "etag2idx.pkl"),
         "--recog_emotion",
         "--inference_method", "par_fd_vs_aln",
         "--n_frames", str(CHUNK),
         "-ot", our_csv,
         "-of", os.path.join(workdir, "our_frames"),
         "-d", "CPU"],
        capture_output=True, text=True, timeout=1800, cwd=REPO_ROOT,
    )
    assert proc.returncode == 0, (
        f"repo demo_video failed\nstdout:\n{proc.stdout[-3000:]}\n"
        f"stderr:\n{proc.stderr[-3000:]}"
    )

    ref_df = _rows(ref_csv)
    our_df = _rows(our_csv)

    # ---- row-by-row tracker.csv agreement ---------------------------
    assert len(ref_df) == len(our_df) == N_FRAMES_TOTAL
    found = 0
    for i in range(len(ref_df)):
        assert float(ref_df["Time"][i]) == pytest.approx(
            float(our_df["Time"][i])), f"row {i} Time"
        assert int(ref_df["Frame_idx"][i]) == int(our_df["Frame_idx"][i])
        ref_names = ast.literal_eval(ref_df["Names"][i])
        our_names = ast.literal_eval(our_df["Names"][i])
        assert ref_names == our_names, (
            f"row {i}: names {ref_names} vs {our_names}")
        found += len(ref_names)
        ref_bb = np.asarray(ast.literal_eval(ref_df["Bboxes"][i]),
                            dtype=np.float64)
        our_bb = np.asarray(ast.literal_eval(our_df["Bboxes"][i]),
                            dtype=np.float64)
        assert ref_bb.shape == our_bb.shape, f"row {i} bbox count"
        if ref_bb.size:
            np.testing.assert_allclose(
                our_bb, ref_bb, atol=BBOX_ATOL,
                err_msg=f"row {i} bboxes")
        ref_emo = ast.literal_eval(ref_df["Emotion"][i])
        our_emo = ast.literal_eval(our_df["Emotion"][i])
        assert ref_emo == our_emo, f"row {i} emotions"
    # the oracle is vacuous unless the pipelines actually found faces
    assert found >= N_FRAMES_TOTAL * 3 // 4, (
        f"only {found} named faces across {N_FRAMES_TOTAL} frames")
    # at least two distinct celebrities recognised by BOTH pipelines
    all_names = {
        n for i in range(len(ref_df))
        for n in ast.literal_eval(ref_df["Names"][i])
    }
    assert len(all_names - {"Unknown"}) >= 2, all_names

    # ---- tracker.json equality (statistic exporters) ----------------
    sys.path.insert(0, REPO_ROOT)
    try:
        from celeb_statistic import export_json_stat_dynamic_itv
    finally:
        sys.path.pop(0)
    our_json_path = os.path.join(workdir, "our_tracker.json")
    export_json_stat_dynamic_itv(our_df, our_json_path, N_INTERVALS,
                                 n_appear=N_APPEAR)
    with open(os.path.join(workdir, "ref_tracker.json")) as fh:
        ref_js = json.load(fh)
    with open(our_json_path) as fh:
        our_js = json.load(fh)

    assert set(ref_js) == set(our_js) == {
        str(i + 1) for i in range(N_INTERVALS)}
    for itv in ref_js:
        assert ref_js[itv]["interval"] == our_js[itv]["interval"]
        ref_cel = ref_js[itv]["celebrities"]
        our_cel = our_js[itv]["celebrities"]
        assert set(ref_cel) == set(our_cel), f"interval {itv}"
        assert ref_cel, f"interval {itv} has no celebrities (vacuous)"
        for name in ref_cel:
            assert len(ref_cel[name]) == len(our_cel[name])
            for ra, oa in zip(ref_cel[name], our_cel[name]):
                assert ra["time"] == oa["time"]
                assert ra["emotions"] == oa["emotions"]
                np.testing.assert_allclose(
                    np.asarray(oa["bbox"], np.float64),
                    np.asarray(ra["bbox"], np.float64),
                    atol=BBOX_ATOL,
                )
