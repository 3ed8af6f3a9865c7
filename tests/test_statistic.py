"""tracker.json aggregation tests (celeb_statistic post-pass)."""

import json
import os

import numpy as np
import pandas as pd

from celeb_statistic import (
    export_json_stat_dynamic_itv,
    export_json_stat_fixed_itv,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_tracker_df():
    rows = []
    for i in range(20):
        t = i * 0.5
        if i % 2 == 0:
            names = ["Alice", "Unknown"]
            bbs = [[0.1, 0.1, 0.3, 0.4], [0.5, 0.5, 0.7, 0.8]]
        else:
            names = ["Bob"]
            bbs = [[0.2, 0.2, 0.4, 0.5]]
        rows.append(
            {
                "Time": t,
                "Names": str(names),
                "Frame_idx": i + 1,
                "Bboxes": str(bbs),
                "Emotion": str([[] for _ in names]),
            }
        )
    return pd.DataFrame(rows)


def test_dynamic_intervals(tmp_path):
    df = make_tracker_df()
    out = tmp_path / "tracker.json"
    track = export_json_stat_dynamic_itv(df, str(out), n_intervals=4,
                                         n_appear=2)
    data = json.loads(out.read_text())
    assert set(data.keys()) == {"1", "2", "3", "4"}
    for itv in data.values():
        assert "interval" in itv and "celebrities" in itv
        assert "Unknown" not in itv["celebrities"]
        for name, sightings in itv["celebrities"].items():
            assert len(sightings) >= 2
            for s in sightings:
                assert set(s) == {"time", "bbox", "emotions"}
                assert "h:" in s["time"] and "m:" in s["time"]


def test_fixed_intervals_appearance_filter(tmp_path):
    df = make_tracker_df()
    out = tmp_path / "tracker.json"
    export_json_stat_fixed_itv(df, str(out), n_rows_in_itv=5, n_appear=3)
    data = json.loads(out.read_text())
    assert len(data) == 4
    # each fixed interval holds 5 rows -> Alice appears 2-3x, Bob 2-3x;
    # with n_appear=3 only the one with >=3 sightings survives
    for itv in data.values():
        for name, sightings in itv["celebrities"].items():
            assert len(sightings) >= 3


def test_production_1020_class_tables():
    """The published deployment tables (reference meta_data/
    face_recognition/label2name_1020_cls.txt + local_thresholds.json,
    used by scripts/celeb_stat_*.sh with -nc 1021) must load through
    the celeb_statistic threshold logic end to end."""
    from vn_celeb_face_recognition_tpu.pipeline import identify_person
    from vn_celeb_face_recognition_tpu.utils import read_json

    meta = os.path.join(REPO, "meta_data", "face_recognition")
    thresholds = read_json(os.path.join(meta, "local_thresholds.json"))
    assert len(thresholds) == 1020
    assert set(thresholds) == {str(i) for i in range(1020)}
    assert all(0.0 < v <= 1.0 for v in thresholds.values())
    # learned outliers exist alongside the 0.8 default
    assert any(abs(v - 0.8) > 1e-6 for v in thresholds.values())

    name_df = pd.read_csv(os.path.join(meta, "label2name_1020_cls.txt"))
    assert list(name_df.columns) == ["label", "name"]
    # label 1020 is the explicit Unknown row — the rejection class that
    # identify_person assigns below-threshold faces (hence -nc 1021 in
    # scripts/celeb_stat_*.sh)
    assert name_df["label"].between(0, 1020).all()
    assert name_df["label"].is_unique
    unknown_rows = name_df[name_df["label"] == 1020]
    assert list(unknown_rows["name"]) == ["Unknown"]

    # synthetic 1020-way log-probs: one confident hit on a named label,
    # one confident hit on an unnamed label, one below-threshold hit
    named_label = int(name_df["label"].iloc[0])
    named_name = str(name_df["name"].iloc[0])
    unnamed_label = next(
        i for i in range(1020) if i not in set(name_df["label"])
    )
    assert unnamed_label is not None
    n_cls = 1020
    logp = np.full((3, n_cls), -20.0)
    logp[0, named_label] = np.log(0.99)
    logp[1, unnamed_label] = np.log(0.99)
    low = min(0.5, thresholds[str(named_label)] - 0.05)
    logp[2, named_label] = np.log(low)
    names = identify_person(logp, None, name_df, thresholds)
    assert names[0] == named_name
    assert names[1] == "Unknown"  # confident but no name row
    assert names[2] == "Unknown"  # below the per-class threshold

    # the 18-line label2name.txt alias table also loads
    small_df = pd.read_csv(os.path.join(meta, "label2name.txt"))
    assert list(small_df.columns) == ["label", "name"]
    assert len(small_df) >= 16


def test_no_emotion_column(tmp_path):
    df = make_tracker_df().drop(columns=["Emotion"])
    out = tmp_path / "tracker.json"
    export_json_stat_dynamic_itv(df, str(out), n_intervals=2, n_appear=1)
    data = json.loads(out.read_text())
    assert len(data) == 2
