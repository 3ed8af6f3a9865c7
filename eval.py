"""Evaluation CLI — same wiring as train.py but runs
``trainer.eval(save_result)`` producing result.csv
(Path/Target/Prediction/Probability), mirroring /root/reference/eval.py.
"""

import argparse

import numpy as np

from vn_celeb_face_recognition_tpu.utils import read_json
from train import build_trainer_from_config, SEED


def main(config):
    np.random.seed(SEED)
    trainer, _, _ = build_trainer_from_config(config)
    # variables initialise lazily from the first val batch (resume_path
    # in the config is applied at that point)
    trainer.eval(config["trainer"]["save_result"])
    return trainer


if __name__ == "__main__":
    args_parser = argparse.ArgumentParser(
        description="VNCeleb - Face Recognition (TPU)"
    )
    args_parser.add_argument("-c", "--config", default=None, type=str,
                             help="Path of config file")
    args_parser.add_argument("-d", "--device", default=None, type=str)
    args = args_parser.parse_args()
    from vn_celeb_face_recognition_tpu.utils import select_platform

    config = read_json(args.config)
    select_platform(args.device or config["trainer"].get("device"))
    main(config)
