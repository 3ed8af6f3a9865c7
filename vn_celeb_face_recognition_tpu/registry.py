"""Name -> component registries for config-driven construction.

The reference resolves config ``name`` strings via getattr() on module
namespaces (/root/reference/train.py:40-72, demo_image.py:361-382);
here the same two-tier config shape (JSON tree + per-CLI flags) resolves
through explicit registries, so a bad name fails with the full list of
valid options instead of an AttributeError.
"""

from . import data as _data
from .training import trainer as _trainer
from .training.losses import LOSSES, METRICS

DATASETS = {
    "VNCelebDataset": _data.VNCelebDataset,
    "VNCelebEmbDataset": _data.VNCelebEmbDataset,
}

TRAINERS = {
    "ClassificationTrainer": _trainer.ClassificationTrainer,
    "AugClassificationTrainer": _trainer.AugClassificationTrainer,
}


def build_dataset(name, **kwargs):
    if name not in DATASETS:
        raise KeyError(f"Unknown dataset '{name}'; have {sorted(DATASETS)}")
    return DATASETS[name](**kwargs)


def build_trainer(name, *args, **kwargs):
    if name not in TRAINERS:
        raise KeyError(f"Unknown trainer '{name}'; have {sorted(TRAINERS)}")
    return TRAINERS[name](*args, **kwargs)


def get_loss(name):
    return LOSSES[name]


def get_metric(name):
    return METRICS[name]
