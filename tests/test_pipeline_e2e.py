"""Pipeline integration tests: the demo_image path (detect -> align ->
embed -> classify -> draw) and the demo_video streaming loop with
tracker.csv output, on real face pixels from the reference's shipped
toy images. Models are small/random where weights aren't shipped; the
subject is the plumbing, formats and masks, not recognition quality.
"""

import argparse
import glob
import json
import os

import numpy as np
import pytest

from toy_data import toy_face_files


@pytest.fixture(scope="module")
def face_image():
    from PIL import Image

    files = toy_face_files()
    if not files:
        pytest.skip("toy face fixture unavailable")
    return np.asarray(
        Image.open(files[0]).convert("RGB").resize((160, 160)),
        dtype=np.uint8,
    )


@pytest.fixture(scope="module")
def pipeline_files(tmp_path_factory):
    root = tmp_path_factory.mktemp("pipe")
    label2name = root / "label2name.csv"
    with open(label2name, "w") as f:
        f.write("label,name\n")
        for i in range(16):
            f.write(f"{i},Person_{i}\n")
    enc_cfg = root / "enc.json"
    enc_cfg.write_text(json.dumps({"pretrained": None}))
    det_cfg = root / "det.json"
    det_cfg.write_text(
        json.dumps({"image_size": 160, "keep_all": True,
                    "min_face_size": 40})
    )
    return {
        "root": root,
        "label2name": str(label2name),
        "enc_cfg": str(enc_cfg),
        "det_cfg": str(det_cfg),
    }


def make_args(pipeline_files, **overrides):
    import demo_image

    parser = demo_image.build_arg_parser()
    args = parser.parse_args([])
    args.label2name = pipeline_files["label2name"]
    args.encoder_args = pipeline_files["enc_cfg"]
    args.detection_args = pipeline_files["det_cfg"]
    args.encoder = "InceptionResnetV1"
    args.detection = "MTCNN"
    args.num_classes = 16
    args.classify_model = ""
    args.inference_method = "par_fd_vs_aln"
    for k, v in overrides.items():
        setattr(args, k, v)
    return args


def test_demo_image_end_to_end(face_image, pipeline_files, tmp_path):
    import cv2

    import demo_image

    img_path = str(tmp_path / "input.png")
    out_path = str(tmp_path / "out.png")
    cv2.imwrite(img_path, cv2.cvtColor(face_image, cv2.COLOR_RGB2BGR))

    args = make_args(
        pipeline_files, image_path=img_path, output_path=out_path,
        recog_threshold=0.0,
    )
    names, boxes = demo_image.main(args)
    assert os.path.exists(out_path)
    assert len(names) == len(boxes) == 1
    assert names[0].startswith("Person_") or names[0] == "Unknown"


def test_demo_image_threshold_unknown(face_image, pipeline_files,
                                      tmp_path):
    """With an impossible threshold every face must be 'Unknown'
    (identify_person per-class threshold path)."""
    import cv2

    import demo_image

    img_path = str(tmp_path / "input.png")
    out_path = str(tmp_path / "out.png")
    cv2.imwrite(img_path, cv2.cvtColor(face_image, cv2.COLOR_RGB2BGR))
    args = make_args(
        pipeline_files, image_path=img_path, output_path=out_path,
        recog_threshold=1.1,
    )
    names, _ = demo_image.main(args)
    assert names == ["Unknown"]


@pytest.mark.slow
def test_demo_video_tracker_csv(face_image, pipeline_files, tmp_path):
    import cv2
    import pandas as pd

    import demo_image
    import demo_video

    # synthesize an 8-frame video of the face drifting on a background
    video_path = str(tmp_path / "clip.avi")
    h, w = 240, 320
    writer = cv2.VideoWriter(
        video_path, cv2.VideoWriter_fourcc(*"MJPG"), 8.0, (w, h)
    )
    assert writer.isOpened()
    bgr_face = cv2.cvtColor(face_image, cv2.COLOR_RGB2BGR)
    for t in range(8):
        frame = np.full((h, w, 3), 60, dtype=np.uint8)
        x0 = 20 + 4 * t
        frame[40:200, x0:x0 + 160] = cv2.resize(bgr_face, (160, 160))
        writer.write(frame)
    writer.release()

    args = make_args(
        pipeline_files,
        video_path=video_path,
        output_tracker=str(tmp_path / "tracker.csv"),
        output_frame=str(tmp_path / "frames"),
        n_frames=4,
        log_step=100,
        recog_threshold=0.0,
    )
    models = demo_image.setup_models(args)
    from vn_celeb_face_recognition_tpu.pipeline import center_point_dict

    target_fs = (args.target_face_size, args.target_face_size)
    center_point = center_point_dict[str(target_fs)]
    processed, wall = demo_video.process_video(
        args, models, target_fs, center_point, args.recog_threshold
    )
    assert processed == 8

    df = pd.read_csv(args.output_tracker)
    assert list(df.columns) == ["Time", "Names", "Frame_idx", "Bboxes"]
    assert len(df) == 8
    # at least half the frames should carry a detection with a
    # normalised bbox inside [0, 1]
    import ast

    n_with_faces = 0
    for _, row in df.iterrows():
        bbs = ast.literal_eval(row["Bboxes"])
        names = ast.literal_eval(row["Names"])
        assert len(bbs) == len(names)
        for bb in bbs:
            assert all(-0.1 <= v <= 1.1 for v in bb)
        n_with_faces += bool(bbs)
    assert n_with_faces >= 4


@pytest.mark.slow
def test_demo_video_fused_engine(face_image, pipeline_files, tmp_path):
    """--fused_engine path: one device program per chunk, same tracker
    format."""
    import cv2
    import pandas as pd

    import demo_image
    import demo_video

    video_path = str(tmp_path / "clip2.avi")
    h, w = 192, 192
    writer = cv2.VideoWriter(
        video_path, cv2.VideoWriter_fourcc(*"MJPG"), 8.0, (w, h)
    )
    bgr_face = cv2.cvtColor(face_image, cv2.COLOR_RGB2BGR)
    for t in range(6):
        frame = np.full((h, w, 3), 70, dtype=np.uint8)
        frame[16:176, 16:176] = cv2.resize(bgr_face, (160, 160))
        writer.write(frame)
    writer.release()

    args = make_args(
        pipeline_files,
        video_path=video_path,
        output_tracker=str(tmp_path / "tracker2.csv"),
        output_frame=str(tmp_path / "frames2"),
        n_frames=3,
        log_step=100,
        recog_threshold=0.0,
        fused_engine=True,
        recog_emotion=False,
    )
    models = demo_image.setup_models(args)
    from vn_celeb_face_recognition_tpu.pipeline import center_point_dict

    target_fs = (args.target_face_size, args.target_face_size)
    center_point = center_point_dict[str(target_fs)]
    processed, wall = demo_video.process_video(
        args, models, target_fs, center_point, args.recog_threshold
    )
    assert processed == 6
    df = pd.read_csv(args.output_tracker)
    assert len(df) == 6
    import ast

    detected = sum(
        bool(ast.literal_eval(r)) for r in df["Bboxes"]
    )
    assert detected >= 4


@pytest.mark.slow
def test_demo_video_fused_engine_n_devices(face_image, pipeline_files,
                                           tmp_path):
    """--n_devices 8: the CLI-built engine shards each frame chunk over
    the 8-virtual-device 'data' axis and writes the SAME tracker.csv as
    the single-device run (VERDICT r4 #4 — the sharded engine must be
    reachable from the video entry points, not only the library)."""
    import ast

    import cv2
    import pandas as pd

    import demo_image
    import demo_video

    video_path = str(tmp_path / "clip_mesh.avi")
    h, w = 192, 192
    writer = cv2.VideoWriter(
        video_path, cv2.VideoWriter_fourcc(*"MJPG"), 8.0, (w, h)
    )
    bgr_face = cv2.cvtColor(face_image, cv2.COLOR_RGB2BGR)
    for t in range(6):
        frame = np.full((h, w, 3), 70, dtype=np.uint8)
        frame[16:176, 16:176] = cv2.resize(bgr_face, (160, 160))
        writer.write(frame)
    writer.release()

    from vn_celeb_face_recognition_tpu.pipeline import center_point_dict

    trackers = {}
    for n_dev in (1, 8):
        args = make_args(
            pipeline_files,
            video_path=video_path,
            output_tracker=str(tmp_path / f"tracker_nd{n_dev}.csv"),
            output_frame=str(tmp_path / f"frames_nd{n_dev}"),
            n_frames=3,  # not divisible by 8: exercises chunk padding
            log_step=100,
            recog_threshold=0.0,
            fused_engine=True,
            recog_emotion=False,
            n_devices=n_dev,
        )
        models = demo_image.setup_models(args)
        target_fs = (args.target_face_size, args.target_face_size)
        center_point = center_point_dict[str(target_fs)]
        processed, _ = demo_video.process_video(
            args, models, target_fs, center_point, args.recog_threshold
        )
        assert processed == 6
        trackers[n_dev] = pd.read_csv(args.output_tracker)

    a, b = trackers[1], trackers[8]
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b) == 6
    assert (a["Names"] == b["Names"]).all()
    assert (a["Frame_idx"] == b["Frame_idx"]).all()
    detected = 0
    for ra, rb in zip(a["Bboxes"], b["Bboxes"]):
        ba, bb = ast.literal_eval(ra), ast.literal_eval(rb)
        assert len(ba) == len(bb)
        detected += bool(ba)
        for va, vb in zip(ba, bb):
            np.testing.assert_allclose(va, vb, rtol=1e-4, atol=1e-4)
    assert detected >= 4


@pytest.mark.slow
def test_demo_video_fused_engine_emotion(face_image, pipeline_files,
                                         tmp_path):
    """--fused_engine + --recog_emotion: the emotion head fuses into
    the same device program (no fallback), and the tracker carries an
    Emotion column of per-face top-k tag lists."""
    import ast

    import cv2
    import pandas as pd

    import demo_image
    import demo_video

    emt_cfg = tmp_path / "emt.json"
    emt_cfg.write_text(json.dumps({"pretrained": False,
                                   "num_classes": 690,
                                   "checkpoint_path": None}))
    video_path = str(tmp_path / "clip3.avi")
    h, w = 192, 192
    writer = cv2.VideoWriter(
        video_path, cv2.VideoWriter_fourcc(*"MJPG"), 8.0, (w, h)
    )
    bgr_face = cv2.cvtColor(face_image, cv2.COLOR_RGB2BGR)
    for _ in range(4):
        frame = np.full((h, w, 3), 70, dtype=np.uint8)
        frame[16:176, 16:176] = cv2.resize(bgr_face, (160, 160))
        writer.write(frame)
    writer.release()

    args = make_args(
        pipeline_files,
        video_path=video_path,
        output_tracker=str(tmp_path / "tracker3.csv"),
        output_frame=str(tmp_path / "frames3"),
        n_frames=2,
        log_step=100,
        recog_threshold=0.0,
        fused_engine=True,
        recog_emotion=True,
        emotion_args=str(emt_cfg),
        etag2idx_file="meta_data/emotion_recognition/etag2idx.pkl",
        topk_emotions=3,
    )
    models = demo_image.setup_models(args)
    from vn_celeb_face_recognition_tpu.pipeline import center_point_dict

    target_fs = (args.target_face_size, args.target_face_size)
    center_point = center_point_dict[str(target_fs)]
    processed, wall = demo_video.process_video(
        args, models, target_fs, center_point, args.recog_threshold
    )
    assert processed == 4
    df = pd.read_csv(args.output_tracker)
    assert list(df.columns) == ["Time", "Names", "Frame_idx", "Bboxes",
                                "Emotion"]
    rows_with_emotion = 0
    for _, row in df.iterrows():
        names = ast.literal_eval(row["Names"])
        emotions = ast.literal_eval(row["Emotion"])
        if names:
            assert len(emotions) == len(names)
            for tags in emotions:
                assert len(tags) == 3
                assert all(isinstance(t, str) for t in tags)
            rows_with_emotion += 1
    assert rows_with_emotion >= 2


def test_export_video_sparse_frame_indices(tmp_path):
    """Re-mux must handle sparse frame indices (-fidx sampling saves
    frame_<original idx>.png); the reference read missing dense names
    (reference demo_video.py:25-43)."""
    import cv2

    import demo_video

    frame_dir = tmp_path / "sparse_frames"
    frame_dir.mkdir()
    # simulate -fidx "1 6": indices 1, 6, 26, 31 (sparse, unsorted glob)
    for i in [31, 1, 26, 6]:
        img = np.full((64, 64, 3), i, dtype=np.uint8)
        cv2.imwrite(str(frame_dir / "frame_{}.png".format(i)), img)
    out = str(tmp_path / "sparse.mp4")
    demo_video.export_video_face_recognition(str(frame_dir), 4.0, out)
    assert os.path.exists(out)
    cap = cv2.VideoCapture(out)
    frames = []
    while True:
        ret, f = cap.read()
        if not ret:
            break
        frames.append(int(np.median(f)))
    cap.release()
    assert len(frames) == 4
    # temporal order preserved (lossy codec -> compare loosely)
    assert frames == sorted(frames)

    # empty dir: no crash, no output
    empty = tmp_path / "no_frames"
    empty.mkdir()
    out2 = str(tmp_path / "none.mp4")
    demo_video.export_video_face_recognition(str(empty), 4.0, out2)
    assert not os.path.exists(out2)


@pytest.mark.slow
def test_celeb_statistic_end_to_end(face_image, pipeline_files,
                                    tmp_path, monkeypatch):
    """celeb_statistic main(): frame-index sampling, local thresholds,
    tracker.csv + tracker.json emission, tracker reuse."""
    import sys

    import cv2

    video_path = str(tmp_path / "stat.avi")
    h, w = 200, 200
    writer = cv2.VideoWriter(
        video_path, cv2.VideoWriter_fourcc(*"MJPG"), 4.0, (w, h)
    )
    bgr_face = cv2.cvtColor(face_image, cv2.COLOR_RGB2BGR)
    for t in range(16):
        frame = np.full((h, w, 3), 65, dtype=np.uint8)
        frame[20:180, 20:180] = cv2.resize(bgr_face, (160, 160))
        writer.write(frame)
    writer.release()

    thresholds = {str(i): 0.0 for i in range(16)}
    thr_path = tmp_path / "local_thresholds.json"
    thr_path.write_text(json.dumps(thresholds))

    tracker_csv = tmp_path / "stat_tracker.csv"
    tracker_json = tmp_path / "stat_tracker.json"
    argv = [
        "celeb_statistic.py",
        "-vp", video_path,
        "-ot", str(tracker_csv),
        "-jst", str(tracker_json),
        "-l2n", pipeline_files["label2name"],
        "-eargs", pipeline_files["enc_cfg"],
        "-dargs", pipeline_files["det_cfg"],
        "-det", "MTCNN",
        "-enc", "InceptionResnetV1",
        "-m", "",
        "-nc", "16",
        "-fidx", "1", "3",
        "--n_frames", "4",
        "--track_bbox",
        "--local_thresholds", str(thr_path),
        "--statistic_mode", "dynamic_itv",
        "-nvi", "2",
        "-tap", "1",
        "-of", str(tmp_path / "stat_frames"),
    ]
    monkeypatch.setattr(sys, "argv", argv)
    import celeb_statistic

    celeb_statistic.main()

    import pandas as pd

    df = pd.read_csv(tracker_csv)
    # 16 frames at 4 fps, sampling idx {1,3} per second -> 8 rows
    assert len(df) == 8
    data = json.loads(tracker_json.read_text())
    assert set(data.keys()) == {"1", "2"}
    total_sightings = sum(
        len(v) for itv in data.values()
        for v in itv["celebrities"].values()
    )
    assert total_sightings >= 4

    # reuse path: main() with the tracker present must not reprocess
    tracker_json.unlink()
    celeb_statistic.main()
    assert tracker_json.exists()


@pytest.mark.slow
def test_demo_image_with_emotion(face_image, pipeline_files, tmp_path):
    """--recog_emotion path: emotion model loads from cfg, top-k tags
    map through the idx2key pickle and draw onto the output."""
    import cv2

    import demo_image

    emt_cfg = tmp_path / "emt.json"
    emt_cfg.write_text(json.dumps({"pretrained": False,
                                   "num_classes": 690,
                                   "checkpoint_path": None}))
    img_path = str(tmp_path / "in.png")
    out_path = str(tmp_path / "out_emt.png")
    cv2.imwrite(img_path, cv2.cvtColor(face_image, cv2.COLOR_RGB2BGR))

    args = make_args(
        pipeline_files,
        image_path=img_path,
        output_path=out_path,
        recog_threshold=0.0,
        recog_emotion=True,
        emotion_args=str(emt_cfg),
        etag2idx_file="meta_data/emotion_recognition/etag2idx.pkl",
        topk_emotions=3,
    )
    names, boxes = demo_image.main(args)
    assert os.path.exists(out_path)
    assert len(names) == 1


@pytest.mark.slow
def test_demo_video_main_cli(face_image, pipeline_files, tmp_path,
                             monkeypatch):
    """demo_video.main() through argv: frame loop + tracker + saved
    frames + MP4 re-mux."""
    import sys

    import cv2

    import demo_video

    video_path = str(tmp_path / "cli.avi")
    writer = cv2.VideoWriter(
        video_path, cv2.VideoWriter_fourcc(*"MJPG"), 6.0, (176, 176)
    )
    bgr_face = cv2.cvtColor(face_image, cv2.COLOR_RGB2BGR)
    for _ in range(4):
        frame = np.full((176, 176, 3), 75, dtype=np.uint8)
        frame[8:168, 8:168] = cv2.resize(bgr_face, (160, 160))
        writer.write(frame)
    writer.release()

    out_video = str(tmp_path / "annotated.mp4")
    argv = [
        "demo_video.py",
        "-vp", video_path,
        "-ot", str(tmp_path / "cli_tracker.csv"),
        "-of", str(tmp_path / "cli_frames"),
        "-l2n", pipeline_files["label2name"],
        "-eargs", pipeline_files["enc_cfg"],
        "-dargs", pipeline_files["det_cfg"],
        "-det", "MTCNN", "-enc", "InceptionResnetV1",
        "-m", "", "-nc", "16",
        "--inference_method", "par_fd_vs_aln",
        "--n_frames", "2",
        "-sfr",
        "-ov", out_video,
        "-fps", "6.0",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    demo_video.main()

    import pandas as pd

    df = pd.read_csv(tmp_path / "cli_tracker.csv")
    assert len(df) == 4
    assert os.path.exists(tmp_path / "cli_frames" / "frame_1.png")
    assert os.path.exists(out_video)


@pytest.mark.slow
def test_demo_image_fan_seq_end_to_end(face_image, pipeline_files,
                                       tmp_path, monkeypatch):
    """--fan_weights drives the reference's per-face FAN flow
    (demo_image.py:201-234,242-270): crop -> 4-module 2DFAN ->
    heatmap decode -> 68->5 reduction -> warp -> embed -> classify.

    The weights are a converted random-init 4-module state_dict (the
    released checkpoint's exact manifest — test_fan4_manifest); random
    landmarks usually fail the geometric sanity gate, so the gate is
    wrapped to always accept while still RUNNING the real reduction
    (the gate itself is pinned by test_fan_parity /
    test_landmarker_end_to_end_shapes). Every numeric stage is real.
    """
    import cv2

    import demo_image
    import vn_celeb_face_recognition_tpu.models.fan as fan_mod
    from test_fan_parity import TFAN

    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    ref = TFAN(num_modules=4)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    fan_npz = tmp_path / "fan4.npz"
    np.savez(fan_npz, **sd)

    real_reduce = fan_mod.reduce_to_5_points

    def lenient_reduce(pts68):
        lm, _ = real_reduce(pts68)
        return lm, True

    monkeypatch.setattr(fan_mod, "reduce_to_5_points", lenient_reduce)

    img_path = str(tmp_path / "in.png")
    out_path = str(tmp_path / "out_fan.png")
    cv2.imwrite(img_path, cv2.cvtColor(face_image, cv2.COLOR_RGB2BGR))
    args = make_args(
        pipeline_files,
        image_path=img_path,
        output_path=out_path,
        inference_method="seq_fd_vs_aln",
        fan_weights=str(fan_npz),
        recog_threshold=0.0,
    )
    names, boxes = demo_image.main(args)
    assert os.path.exists(out_path)
    assert len(names) == len(boxes) == 1
    assert names[0].startswith("Person_") or names[0] == "Unknown"
