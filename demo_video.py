"""Streaming video face-recognition CLI -> tracker.csv.

Same flags, frame loop semantics and tracker.csv format as
/root/reference/demo_video.py: read frames into a queue of ``n_frames``,
batch detect/align/recognize, draw + optionally save frame_<idx>.png,
append (Time, Names, Frame_idx, Bboxes[, Emotion]) rows with bboxes
normalised to [0,1], report FPS, optionally re-mux saved frames to MP4.

TPU redesign: the frame chunk is ONE device batch end-to-end (the
reference looped per frame/face on the host), and decode of the next
chunk overlaps with device compute via a reader thread.
"""

import glob
import os
import queue
import threading
import time
from pathlib import Path

import numpy as np

from vn_celeb_face_recognition_tpu.pipeline import (
    center_point_dict,
    draw_boxes_on_image,
    draw_emotions,
    parallel_detect_and_align,
    recognize_celeb,
    recognize_emotion,
    sequential_detect_and_align,
)
from vn_celeb_face_recognition_tpu.utils import (
    append_log_to_file,
    convert_sec_to_max_time_quantity,
)
from vn_celeb_face_recognition_tpu.utils.tracing import StageTimer
from demo_image import build_arg_parser as build_image_arg_parser, \
    setup_models


def export_video_face_recognition(output_frame_dir, fps, output_path):
    """Re-encode saved frame_<i>.png files into an MP4
    (reference demo_video.py:25-43).

    Frames are saved under their ORIGINAL video index, which is sparse
    when -fidx sampling is active; the reference assumed dense
    frame_1..N names and read missing files. Here the saved frames are
    globbed and sorted by their numeric index instead."""
    import cv2

    container_path = Path(output_frame_dir)
    image_files = sorted(
        glob.glob(str(container_path / "frame_*.png")),
        key=lambda p: int(Path(p).stem.split("_")[-1]),
    )
    if not image_files:
        print("No saved frames in {}; nothing to export.".format(
            output_frame_dir))
        return
    first_img = cv2.imread(image_files[0])
    height, width, _ = first_img.shape
    out_writer = cv2.VideoWriter(
        output_path, cv2.VideoWriter_fourcc(*"MP4V"), fps, (width, height)
    )
    for image_file in image_files:
        out_writer.write(cv2.imread(image_file))
    out_writer.release()
    print("Save exported video in {} ...".format(output_path))


def frame_chunks(video_path, n_frames, frame_idxes=None, prefetch=2,
                 use_native=None):
    """Decode chunks of n_frames on a reader thread. Yields
    (frames list, infos list) where info = [time_in_video, count];
    frames are BGR (cv2 convention) for drawing parity.
    ``frame_idxes``: optional per-second frame indices to sample
    (celeb_statistic.py:180-187 semantics).

    Decoding prefers the native C++ libavcodec reader (threaded codec,
    chunked RGB output) and falls back to cv2.VideoCapture."""
    if use_native is None:
        try:
            from vn_celeb_face_recognition_tpu import native

            use_native = native.available()
        except Exception:
            use_native = False

    q = queue.Queue(maxsize=prefetch)
    sentinel = object()

    def emit_loop(read_next, fps):
        """read_next() -> BGR frame or None; chunks + sampling."""
        count = 0
        frames, infos = [], []
        while True:
            frame = read_next()
            if frame is None:
                break
            count += 1
            if frame_idxes is not None:
                if not any(count % fps == idx for idx in frame_idxes):
                    continue
            frames.append(frame)
            infos.append([count / fps, count])
            if len(frames) == n_frames:
                q.put((frames, infos))
                frames, infos = [], []
        if frames:
            q.put((frames, infos))

    def producer_native():
        from vn_celeb_face_recognition_tpu import native

        reader = native.NativeVideoReader(video_path)
        pending = []

        def read_next():
            nonlocal pending
            if not pending:
                chunk = reader.read(max(n_frames, 8))
                if len(chunk) == 0:
                    return None
                pending = [f[:, :, ::-1] for f in chunk]  # RGB -> BGR
            return pending.pop(0)

        try:
            emit_loop(read_next, reader.fps or 25.0)
        finally:
            reader.close()
            q.put(sentinel)

    def producer_cv2():
        import cv2

        cap = cv2.VideoCapture(video_path)
        fps = cap.get(cv2.CAP_PROP_FPS) or 25.0

        def read_next():
            ret, frame = cap.read()
            return frame if ret else None

        try:
            emit_loop(read_next, fps)
        finally:
            cap.release()
            q.put(sentinel)

    producer = producer_native if use_native else producer_cv2
    threading.Thread(target=producer, daemon=True).start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        yield item


def get_video_fps(video_path):
    import cv2

    cap = cv2.VideoCapture(video_path)
    fps = cap.get(cv2.CAP_PROP_FPS) or 25.0
    cap.release()
    return fps


def _face_cap_arg(value):
    """--face_cap: '160' -> 160, '64,128,256' -> [64, 128, 256]."""
    parts = [int(v) for v in str(value).split(",") if v.strip()]
    return parts[0] if len(parts) == 1 else parts


def build_fused_engine(models, target_fs, emotion_topk=6,
                       face_cap=None, compute_dtype=None,
                       n_devices=1):
    """Fused single-program engine over the loaded models (MTCNN
    detector path). When the emotion model is loaded it fuses into the
    same device program (reference emotion flow: demo_image.py:79-110
    ran it as a separate host pass per chunk).

    n_devices > 1 (or 0 = every visible device) builds a
    ``('data', 'model')`` mesh and shards each frame chunk over the
    'data' axis — the multi-chip scale-out of the reference's
    single-GPU video loop (demo_video.py:86-192); weights replicate
    and XLA inserts the ICI collectives."""
    from vn_celeb_face_recognition_tpu.pipeline.engine import (
        FusedRecognitionEngine,
    )

    (_, detection_md, emb_model, classify_model, emt_model, _) = models
    emotion_kwargs = {}
    if emt_model is not None:
        emotion_kwargs = {
            "emotion": emt_model.module,
            "emotion_variables": emt_model.variables,
            "emotion_topk": emotion_topk,
        }
    import jax
    import jax.numpy as jnp

    from vn_celeb_face_recognition_tpu.models import coerce_dtype

    mesh = None
    n_devices = int(n_devices)
    if n_devices == 0:
        n_devices = len(jax.devices())
    if n_devices > 1:
        from vn_celeb_face_recognition_tpu.parallel import make_mesh

        avail = len(jax.devices())
        if n_devices > avail:
            raise SystemExit(
                f"--n_devices {n_devices} requested but only {avail} "
                f"device(s) are visible"
            )
        mesh = make_mesh(n_data=n_devices, n_model=1)

    compute_dtype = coerce_dtype(compute_dtype)
    return FusedRecognitionEngine(
        detection_md,
        emb_model.module, emb_model.variables,
        classify_model.module, classify_model.variables,
        target_fs=target_fs[0], face_cap=face_cap,
        compute_dtype=compute_dtype or jnp.float32,
        mesh=mesh,
        **emotion_kwargs,
    )


def process_video(args, models, target_fs, center_point, threshold,
                  frame_idxes=None, track_bbox=True):
    """The shared frame loop (demo_video.py:46-199 /
    celeb_statistic.py:110-295). Returns (processed_frames, wall_time).

    With ``--fused_engine`` the whole detect->align->embed->classify
    chunk runs as ONE device program (pipeline/engine.py); the chunk
    must then keep a fixed size (the tail chunk is padded)."""
    import cv2

    (label2name_df, detection_md, emb_model, classify_model, emt_model,
     idx2etag) = models

    engine = None
    if getattr(args, "fused_engine", False):
        if not hasattr(detection_md, "_build_detect_fn"):
            print("fused engine: requires the MTCNN detector; falling "
                  "back")
        else:
            engine = build_fused_engine(
                models, target_fs, args.topk_emotions,
                face_cap=getattr(args, "face_cap", None),
                compute_dtype=getattr(args, "compute_dtype", None),
                n_devices=getattr(args, "n_devices", 1),
            )
    if engine is None and int(getattr(args, "n_devices", 1)) != 1:
        # 0 means "every visible device"; both 0 and >1 only have an
        # effect through the sharded fused engine — failing loudly
        # beats a silent single-device run the user believes is sharded
        raise SystemExit(
            "--n_devices requires --fused_engine (the per-stage path "
            "runs single-device)"
        )

    if not os.path.exists(args.output_frame):
        os.makedirs(args.output_frame)

    box_requirements = None
    if args.inference_method == "seq_fd_vs_aln":
        box_requirements = {
            "min_dim": args.min_dim_box,
            "box_ratio": args.box_ratio,
        }

    df_columns = ["Time", "Names", "Frame_idx"]
    if track_bbox:
        df_columns.append("Bboxes")
    if args.recog_emotion:
        df_columns.append("Emotion")
    with open(args.output_tracker, "w") as tracker_file:
        tracker_file.write("")
    append_log_to_file(args.output_tracker, df_columns)

    processed_frame = 0
    timer = StageTimer()
    start_time = time.time()
    for frames_queue, frames_info in frame_chunks(
        args.video_path, args.n_frames, frame_idxes
    ):
        processed_frame += len(frames_queue)
        if processed_frame % args.log_step == 0:
            hms = convert_sec_to_max_time_quantity(frames_info[-1][0])
            print(
                "Processing for frame: {}, time: {}".format(
                    frames_info[-1][1], hms
                )
            )

        with timer.stage("bgr2rgb"):
            rgb_images = [
                cv2.cvtColor(f, cv2.COLOR_BGR2RGB) for f in frames_queue
            ]

        bth_emotions = bth_emotion_probs = None
        if engine is not None:
            with timer.stage("fused_engine"):
                stack = np.stack(rgb_images)
                real = stack.shape[0]
                if real < args.n_frames:  # pad tail chunk, fixed shape
                    pad = np.repeat(stack[:1], args.n_frames - real, 0)
                    stack = np.concatenate([stack, pad], 0)
                # adaptive: with face_cap buckets, re-runs the chunk
                # at the next bucket up if the compaction overflowed
                # (no face is ever dropped); single/no bucket = plain
                # process()
                outputs = engine.process_adaptive(stack)
                results = engine.identify(outputs, label2name_df,
                                          threshold)[:real]
            bth_names = [r[0] for r in results]
            bth_chosen_boxes = [r[1] for r in results]
            if args.recog_emotion:
                map_func = np.vectorize(lambda x: idx2etag[x])
                bth_emotions = [
                    map_func(np.asarray(r[2])) if len(r[2]) else []
                    for r in results
                ]
                bth_emotion_probs = [r[3] for r in results]
        else:
            with timer.stage("detect_align"):
                if args.inference_method == "seq_fd_vs_aln":
                    bth_alg_faces, bth_chosen_boxes = \
                        sequential_detect_and_align(
                            rgb_images, detection_md, center_point,
                            target_fs, box_requirements, False,
                        )
                elif args.inference_method == "par_fd_vs_aln":
                    bth_alg_faces, bth_chosen_boxes = \
                        parallel_detect_and_align(
                            rgb_images, detection_md, center_point,
                            target_fs, False,
                        )
                else:
                    raise SystemExit(
                        "Do not support {} method.".format(
                            args.inference_method
                        )
                    )

            with timer.stage("embed_classify"):
                bth_names = recognize_celeb(
                    bth_alg_faces, None, emb_model, classify_model, None,
                    label2name_df, threshold,
                )
            if args.recog_emotion:
                map_func = np.vectorize(lambda x: idx2etag[x])
                bth_emotions, bth_emotion_probs = recognize_emotion(
                    bth_alg_faces, None, emt_model, None, map_func,
                    args.topk_emotions,
                )

        np_image_recogs = []
        for idx, names in enumerate(bth_names):
            if len(names) > 0:
                img_recog = draw_boxes_on_image(
                    frames_queue[idx], bth_chosen_boxes[idx], names
                )
            else:
                img_recog = frames_queue[idx]
            np_image_recogs.append(img_recog)

        if args.recog_emotion:
            for idx, (emotions, probs) in enumerate(
                zip(bth_emotions, bth_emotion_probs)
            ):
                draw_emotions(
                    np_image_recogs[idx], bth_chosen_boxes[idx], emotions,
                    probs,
                )

        if getattr(args, "save_frame_recognized", False):
            for idx, recog_img in enumerate(np_image_recogs):
                image_name = "frame_{}.png".format(frames_info[idx][1])
                cv2.imwrite(
                    os.path.join(args.output_frame, image_name), recog_img
                )

        logged_rows = []
        for idx, names in enumerate(bth_names):
            bboxes = bth_chosen_boxes[idx]
            row = [
                str(frames_info[idx][0]),
                '"' + str(list(names)) + '"',
                str(frames_info[idx][1]),
            ]
            if track_bbox:
                if bboxes is None or len(bboxes) == 0:
                    scaled_bboxes = []
                else:
                    h, w, _ = frames_queue[idx].shape
                    scale = np.array([w, h, w, h])
                    scaled_bboxes = [
                        [float(v) for v in (np.asarray(x) / scale)]
                        for x in bboxes
                    ]
                row.append('"' + str(scaled_bboxes) + '"')
            if args.recog_emotion:
                emotions = bth_emotions[idx]
                emotions_list = []
                if len(bboxes) > 0:
                    for i in range(len(emotions)):
                        # plain str: np.str_ reprs don't literal_eval
                        emotions_list.append(
                            [str(t) for t in emotions[i]]
                        )
                row.append('"' + str(emotions_list) + '"')
            logged_rows.append(",".join(row) + "\n")

        with open(args.output_tracker, "a") as tracker_file:
            tracker_file.write("".join(logged_rows))

    wall = time.time() - start_time
    print("Saved tracker file in {} ...".format(args.output_tracker))
    print(
        "FPS for recognition face: {}".format(int(processed_frame / wall))
    )
    print("Per-stage breakdown:")
    timer.log()
    return processed_frame, wall


def build_arg_parser():
    p = build_image_arg_parser()
    p.description = "Face recognition on a video (TPU)"
    p.add_argument("-ot", "--output_tracker", default="tracker.csv",
                   type=str)
    p.add_argument("-ov", "--output_video", default="", type=str)
    p.add_argument("-fps", "--fps_video", default=25.0, type=float)
    p.add_argument("-sfr", "--save_frame_recognized", action="store_true")
    p.add_argument("--log_step", default=100, type=int)
    p.add_argument("--n_frames", default=16, type=int)
    p.add_argument("--fused_engine", action="store_true",
                   help="run detect+align+embed+classify as one fused "
                        "device program per frame chunk")
    p.add_argument("--compute_dtype", default=None, type=str,
                   help="fused-engine compute dtype (e.g. bfloat16; "
                        "the bench's production profile). Detector/"
                        "encoder dtypes come from -dargs/-eargs JSON "
                        "('dtype': 'bfloat16').")
    p.add_argument("--face_cap", default=None, type=_face_cap_arg,
                   help="global align/embed face budget per chunk for "
                        "the fused engine (compaction). One int, or a "
                        "comma-separated bucket list ('64,128,256'): "
                        "the engine speculatively picks the smallest "
                        "bucket covering the last chunk's face count "
                        "and re-runs at the next bucket on overflow")
    p.add_argument("--n_devices", default=1, type=int,
                   help="shard each fused-engine frame chunk over the "
                        "first N devices of a ('data','model') mesh "
                        "(0 = all visible devices; requires "
                        "--fused_engine). Weights replicate; XLA "
                        "inserts the ICI collectives")
    p.add_argument("-of", "--output_frame", default="output_frame",
                   type=str)
    # rename the image CLI's -i to the video path
    return p


def main():
    parser = build_arg_parser()
    parser.add_argument("-vp", "--video_path", default=None, type=str)
    args = parser.parse_args()
    if args.video_path is None:
        args.video_path = args.image_path  # -i works like the reference

    from vn_celeb_face_recognition_tpu.utils import select_platform

    select_platform(args.device)
    models = setup_models(args)
    target_fs = (args.target_face_size, args.target_face_size)
    center_point = center_point_dict[str(target_fs)]
    process_video(args, models, target_fs, center_point,
                  args.recog_threshold)
    if args.output_video != "":
        export_video_face_recognition(
            args.output_frame, args.fps_video, args.output_video
        )


if __name__ == "__main__":
    main()
