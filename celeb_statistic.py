"""Celebrity-appearance statistics CLI -> tracker.csv + tracker.json.

Same surface as /root/reference/celeb_statistic.py: the demo_video
frame loop plus (a) per-second frame-index sampling (-fidx), (b)
YouTube URL ingestion (--youtube_video, via yt-dlp/pafy when present),
(c) per-class local_thresholds.json, (d) tracker.csv reuse when the
file already exists, and (e) the post-pass aggregation of tracker rows
into interval -> celebrity -> appearance JSON (dynamic or fixed
intervals, >= n_appear sightings filter).
"""

import argparse
import ast
import math
import os

import numpy as np

from vn_celeb_face_recognition_tpu.pipeline import center_point_dict
from vn_celeb_face_recognition_tpu.utils import (
    convert_sec_to_max_time_quantity,
    read_json,
    write_json,
)
from demo_image import setup_models
from demo_video import build_arg_parser as build_video_arg_parser, \
    process_video


# ---------------------------------------------------------------------------
# tracker.json aggregation (reference celeb_statistic.py:32-107)
# ---------------------------------------------------------------------------


def find_celeb_infor_in_interval(df_for_itv, unknown_name, n_appear):
    bboxes_dict = {}
    has_emotion = "Emotion" in df_for_itv.columns
    emotions_col = (
        df_for_itv["Emotion"] if has_emotion
        else ["[]"] * len(df_for_itv["Time"])
    )
    zip_obj = zip(
        df_for_itv["Names"], df_for_itv["Bboxes"], df_for_itv["Time"],
        emotions_col,
    )
    for names_str, bboxes_str, time_s, emotions in zip_obj:
        time_s = float(time_s)
        hms_time = convert_sec_to_max_time_quantity(time_s)
        list_names = ast.literal_eval(names_str)
        list_bboxes = ast.literal_eval(bboxes_str)
        list_emotions = ast.literal_eval(emotions)
        if len(list_emotions) < len(list_names):
            list_emotions = [[] for _ in list_names]
        for name, bbox, emotion in zip(list_names, list_bboxes,
                                       list_emotions):
            bbox_item = {
                "time": hms_time,
                "bbox": bbox,
                "emotions": emotion,
            }
            bboxes_dict.setdefault(name, []).append(bbox_item)

    final_bboxes_dict = {
        k: v
        for k, v in bboxes_dict.items()
        if k != unknown_name and len(v) >= n_appear
    }
    start_itv = convert_sec_to_max_time_quantity(
        float(df_for_itv["Time"].iloc[0])
    )
    end_itv = convert_sec_to_max_time_quantity(
        float(df_for_itv["Time"].iloc[-1])
    )
    return final_bboxes_dict, start_itv, end_itv


def export_json_stat_dynamic_itv(tracker_df, output_js_path, n_intervals,
                                 n_appear=4, unknown_name="Unknown"):
    n_rows = len(tracker_df["Time"])
    dict_track = {}
    n_rows_in_itv = n_rows // n_intervals
    remain_rows = n_rows % n_intervals
    for i in range(n_intervals):
        start_range = i * n_rows_in_itv
        end_range = (i + 1) * n_rows_in_itv
        if i == n_intervals - 1:
            end_range += remain_rows
        df_for_itv = tracker_df.iloc[start_range:end_range]
        final, start_itv, end_itv = find_celeb_infor_in_interval(
            df_for_itv, unknown_name, n_appear
        )
        dict_track[str(i + 1)] = {
            "interval": (start_itv, end_itv),
            "celebrities": final,
        }
    write_json(output_js_path, dict_track, log=True)
    return dict_track


def export_json_stat_fixed_itv(tracker_df, output_js_path, n_rows_in_itv,
                               n_appear=4, unknown_name="Unknown"):
    n_rows = len(tracker_df["Time"])
    dict_track = {}
    n_intervals = math.ceil(n_rows / n_rows_in_itv)
    for i in range(n_intervals):
        start_range = i * n_rows_in_itv
        end_range = min((i + 1) * n_rows_in_itv, n_rows)
        df_for_itv = tracker_df.iloc[start_range:end_range]
        final, start_itv, end_itv = find_celeb_infor_in_interval(
            df_for_itv, unknown_name, n_appear
        )
        dict_track[str(i + 1)] = {
            "interval": (start_itv, end_itv),
            "celebrities": final,
        }
    write_json(output_js_path, dict_track, log=True)
    return dict_track


def resolve_youtube_url(url):
    """Resolve a YouTube page URL to a direct mp4 stream URL
    (reference used pafy, celeb_statistic.py:152-162). Gated: requires
    pafy or yt_dlp to be installed AND network egress."""
    try:
        import pafy  # type: ignore

        play = pafy.new(url).getbest(preftype="mp4")
        return None if play is None else play.url
    except ImportError:
        pass
    try:
        import yt_dlp  # type: ignore

        with yt_dlp.YoutubeDL({"format": "mp4"}) as ydl:
            info = ydl.extract_info(url, download=False)
            return info["url"]
    except ImportError:
        raise SystemExit(
            "YouTube ingestion needs pafy or yt-dlp installed."
        )


def main():
    parser = build_video_arg_parser()
    parser.description = "Celebrity statistics on a video (TPU)"
    parser.add_argument("-vp", "--video_path", default=None, type=str)
    parser.add_argument("-jst", "--json_tracker", default="tracker.json",
                        type=str)
    parser.add_argument("-fidx", "--frame_idxes", nargs="+", type=int)
    parser.add_argument("-ign", "--ignored_name", default="Unknown",
                        type=str)
    parser.add_argument("-nvi", "--n_video_intervals", default=5, type=int)
    parser.add_argument("-tap", "--n_time_appear", default=8, type=int)
    parser.add_argument("--statistic_mode", default="dynamic_itv", type=str,
                        help="dynamic_itv or fixed_itv")
    parser.add_argument("--time_an_interval", default=5, type=int)
    parser.add_argument("--local_thresholds", default="", type=str)
    parser.add_argument("--track_bbox", action="store_true")
    parser.add_argument("--youtube_video", action="store_true")
    args = parser.parse_args()
    if args.video_path is None:
        args.video_path = args.image_path

    from vn_celeb_face_recognition_tpu.utils import select_platform

    select_platform(args.device)

    import pandas as pd

    if args.local_thresholds != "":
        print("Using local thresholds !")
        threshold = read_json(args.local_thresholds)
    else:
        print("Using global a threshold !")
        threshold = {
            str(i): args.recog_threshold for i in range(args.num_classes)
        }

    if args.youtube_video:
        args.video_path = resolve_youtube_url(args.video_path)

    frame_idxes = list(args.frame_idxes) if args.frame_idxes else None

    if not os.path.exists(args.output_tracker):
        print("Create tracker file {}".format(args.output_tracker))
        models = setup_models(args)
        target_fs = (args.target_face_size, args.target_face_size)
        center_point = center_point_dict[str(target_fs)]
        process_video(args, models, target_fs, center_point, threshold,
                      frame_idxes, track_bbox=True)
    else:
        print("Re-use tracker file {}".format(args.output_tracker))
    tracker_df = pd.read_csv(args.output_tracker)

    print("Statistic mode: {}".format(args.statistic_mode))
    if args.statistic_mode == "dynamic_itv":
        export_json_stat_dynamic_itv(
            tracker_df, args.json_tracker, args.n_video_intervals,
            args.n_time_appear, args.ignored_name,
        )
    elif args.statistic_mode == "fixed_itv":
        n_rows_in_itv = args.time_an_interval * len(frame_idxes or [1]) * 60
        export_json_stat_fixed_itv(
            tracker_df, args.json_tracker, n_rows_in_itv,
            args.n_time_appear, args.ignored_name,
        )
    else:
        print(
            "This statistic mode {} is not supported !".format(
                args.statistic_mode
            )
        )


if __name__ == "__main__":
    main()
