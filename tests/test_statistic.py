"""tracker.json aggregation tests (celeb_statistic post-pass)."""

import json

import pandas as pd

from celeb_statistic import (
    export_json_stat_dynamic_itv,
    export_json_stat_fixed_itv,
)


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


def test_no_emotion_column(tmp_path):
    df = make_tracker_df().drop(columns=["Emotion"])
    out = tmp_path / "tracker.json"
    export_json_stat_dynamic_itv(df, str(out), n_intervals=2, n_appear=1)
    data = json.loads(out.read_text())
    assert len(data) == 2
