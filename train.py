"""Training CLI — same config schema and flags as the reference
(/root/reference/train.py): ``python train.py -c cfg/<config>.json``.

The config names datasets / model / loss / metrics / optimizer /
lr_scheduler / trainer exactly like the reference JSON files; resolution
goes through explicit registries and the whole train step runs as one
jitted TPU program (see vn_celeb_face_recognition_tpu/training/trainer).
"""

import argparse

import numpy as np

from vn_celeb_face_recognition_tpu import models as model_md
from vn_celeb_face_recognition_tpu import registry
from vn_celeb_face_recognition_tpu.data import DataLoader
from vn_celeb_face_recognition_tpu.utils import read_json

SEED = 123


def build_trainer_from_config(config, seed=SEED):
    """Construct (trainer, train_loader, val_loader) from a config dict."""
    train_ds = registry.build_dataset(
        config["train_dataset"]["name"], **config["train_dataset"]["args"]
    )
    val_ds = registry.build_dataset(
        config["val_dataset"]["name"], **config["val_dataset"]["args"]
    )
    train_loader = DataLoader(train_ds, seed=seed,
                              **config["train_data_loader"]["args"])
    val_loader = DataLoader(val_ds, **config["val_data_loader"]["args"])

    model, pretrained_vars = model_md.build_model(
        config["model"]["name"], **config["model"]["args"]
    )
    trainer = registry.build_trainer(
        config["trainer"]["name"], config, model, seed=seed
    )
    if pretrained_vars is not None:
        trainer.variables = pretrained_vars
    trainer.setup_loader(train_loader, val_loader)
    return trainer, train_loader, val_loader


def main(config):
    np.random.seed(SEED)
    trainer, _, _ = build_trainer_from_config(config)
    trainer.train(config["trainer"]["track4plot"])
    return trainer


if __name__ == "__main__":
    args_parser = argparse.ArgumentParser(
        description="VNCeleb - Face Recognition (TPU)"
    )
    args_parser.add_argument("-c", "--config", default=None, type=str,
                             help="Path of config file")
    args_parser.add_argument("-d", "--device", default=None, type=str,
                             help="Device override: CPU forces the CPU "
                                  "backend; default uses the TPU")
    args = args_parser.parse_args()
    from vn_celeb_face_recognition_tpu.utils import select_platform

    config = read_json(args.config)
    select_platform(args.device or config["trainer"].get("device"))
    main(config)
