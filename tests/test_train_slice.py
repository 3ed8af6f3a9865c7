"""End-to-end minimum slice: MLP classifier on cached embeddings.

Mirrors the reference's `train.py -c cfg/train_cfg_emb_classify.json`
path (SURVEY.md section 3.1) on a synthetic separable dataset: loss must
fall, accuracy must rise, checkpoints must save/resume, eval must emit
result.csv rows.
"""

import copy
import json
import os

import numpy as np
import pytest


def make_config(data, save_dir, epochs=8, batch_size=16):
    return {
        "name": "toy",
        "train_dataset": {
            "name": "VNCelebEmbDataset",
            "args": {
                "data_dir": data["emb_dir"],
                "label_file": data["train_json"],
            },
        },
        "train_data_loader": {
            "args": {"batch_size": batch_size, "shuffle": True}
        },
        "val_dataset": {
            "name": "VNCelebEmbDataset",
            "args": {
                "data_dir": data["emb_dir"],
                "label_file": data["val_json"],
            },
        },
        "val_data_loader": {
            "args": {"batch_size": batch_size, "shuffle": False}
        },
        "transforms": "none",
        "metrics": ["accuracy"],
        "loss": "neg_log_llhood",
        "model": {
            "name": "MLPModel",
            "args": {"input_dim": 512, "num_classes": data["n_classes"]},
        },
        "trainer": {
            "name": "ClassificationTrainer",
            "resume_path": "",
            "save_dir": str(save_dir),
            "device": "CPU",
            "log_step": 100,
            "do_validation": True,
            "validation_step": 1,
            "epochs": epochs,
            "tracked_metric": ["val_neg_log_llhood", "min"],
            "patience": 10,
            "save_period": 4,
            "save_result": False,
            "track4plot": True,
        },
        "optimizer": {
            "name": "Adam",
            "args": {"lr": 0.001, "weight_decay": 1e-4},
        },
        "lr_scheduler": {
            "name": "ReduceLROnPlateau",
            "args": {
                "mode": "min",
                "threshold": 0.01,
                "factor": 0.5,
                "patience": 1,
                "min_lr": 1e-5,
                "threshold_mode": "rel",
            },
        },
    }


def test_mlp_training_learns(toy_embedding_dataset, tmp_path):
    from train import build_trainer_from_config

    config = make_config(toy_embedding_dataset, tmp_path / "saved")
    trainer, train_loader, _ = build_trainer_from_config(config)

    first_log = trainer._train_epoch(1)
    for epoch in range(2, 9):
        last_log = trainer._train_epoch(epoch)

    assert last_log["neg_log_llhood"] < first_log["neg_log_llhood"] * 0.5
    assert last_log["accuracy"] > 0.9
    # the held-out split is separable too
    assert last_log["val_accuracy"] > 0.8


def test_checkpoint_save_and_resume(toy_embedding_dataset, tmp_path):
    from train import build_trainer_from_config

    config = make_config(toy_embedding_dataset, tmp_path / "saved",
                         epochs=4)
    trainer, _, _ = build_trainer_from_config(config)
    trainer.train(track4plot=True)

    ckpts = list(trainer.save_dir.glob("checkpoint-epoch*.ckpt"))
    assert ckpts, "no checkpoint written"
    assert (trainer.log_dir / "log_loss.txt").exists()

    # resume into a fresh trainer; it must pick up epoch + weights
    config2 = copy.deepcopy(config)
    config2["trainer"]["resume_path"] = str(sorted(ckpts)[-1])
    trainer2, _, _ = build_trainer_from_config(config2)
    log = trainer2._validate_epoch(1)
    # resumed weights should already classify well
    assert log["val_accuracy"] > 0.5
    assert trainer2.start_epoch > 1


def test_eval_result_csv(toy_embedding_dataset, tmp_path):
    import pandas as pd

    from train import build_trainer_from_config

    config = make_config(toy_embedding_dataset, tmp_path / "saved",
                         epochs=2)
    trainer, _, _ = build_trainer_from_config(config)
    trainer.train(track4plot=False)
    trainer.eval(save_result=True)
    df = pd.read_csv(trainer.save_dir / "result.csv")
    assert list(df.columns) == ["Path", "Target", "Prediction",
                                "Probability"]
    assert len(df) == toy_embedding_dataset["n_classes"]
    assert df["Probability"].between(0, 1).all()


def test_early_stopping(toy_embedding_dataset, tmp_path):
    from train import build_trainer_from_config

    config = make_config(toy_embedding_dataset, tmp_path / "saved",
                         epochs=500)
    config["trainer"]["patience"] = 1
    config["optimizer"]["args"]["lr"] = 0.0  # nothing can improve
    trainer, _, _ = build_trainer_from_config(config)
    trainer.train()
    # must have stopped long before 500 epochs: no huge log file
    lines = (trainer.log_dir / "info.txt").read_text().splitlines()
    stops = [ln for ln in lines if "Training stops" in ln]
    assert stops


def test_trainer_multi_device_mesh(toy_embedding_dataset, tmp_path):
    """ClassificationTrainer with trainer.n_devices=8: batches shard
    over the virtual CPU mesh, params replicate, and training still
    learns."""
    from train import build_trainer_from_config

    config = make_config(toy_embedding_dataset, tmp_path / "saved",
                         epochs=4)
    config["trainer"]["n_devices"] = 8
    trainer, _, _ = build_trainer_from_config(config)
    first = trainer._train_epoch(1)
    for epoch in range(2, 5):
        last = trainer._train_epoch(epoch)
    assert trainer.mesh is not None
    assert last["neg_log_llhood"] < first["neg_log_llhood"]
    assert last["accuracy"] > 0.8
