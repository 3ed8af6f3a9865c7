"""The val-accuracy repro harness runs end-to-end on the toy fixture.

tools/repro_baseline.py is the standing one-command driver for the
published 74.24% val-accuracy number (reference readme.md:64-76); the
real data/weights don't exist in this environment, so this test proves
the full split -> embed -> train -> eval plumbing on the in-repo
20-image fixture with a random-init encoder and a tiny epoch budget.
"""

import os
import sys

import numpy as np
import pandas as pd

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO_ROOT, "tools"))


def test_repro_harness_toy_end_to_end(tmp_path):
    import repro_baseline

    np.random.seed(123)
    metrics = repro_baseline.run(
        data_dir=os.path.join(REPO_ROOT, "data"),
        train_csv=os.path.join(REPO_ROOT, "train_toy.csv"),
        work_dir=str(tmp_path / "repro"),
        weights="",  # random-init encoder: plumbing, not the number
        epochs=6,
        patience=6,
        save_period=2,
        batch_size=8,
        embed_batch=8,
        log=False,
    )

    # the split must follow the published hold-out rule: every
    # multi-image identity contributes its last image to val
    assert metrics["n_embedded"] == 20
    assert metrics["n_classes"] == 12  # toy labels 0..11 (gaps kept)
    assert 0.0 <= metrics["val_accuracy"] <= 100.0
    assert metrics["target"] == 74.24

    res = pd.read_csv(metrics["result_csv"])
    assert list(res.columns) == [
        "Path", "Target", "Prediction", "Probability",
    ]
    # one row per held-out validation image (10 multi-image identities)
    assert len(res) == 10

    # intermediate artifacts all materialised
    work = tmp_path / "repro"
    for f in ("vn_celeb.json", "train.json", "val.json"):
        assert (work / f).exists()
    assert len(list((work / "train_emb").glob("*.npz"))) == 20
