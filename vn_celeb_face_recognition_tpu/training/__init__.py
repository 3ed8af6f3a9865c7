from .losses import neg_log_llhood, accuracy, LOSSES, METRICS
from .optim import (
    make_optimizer,
    ReduceLROnPlateau,
    MultiStepLR,
    make_lr_scheduler,
)
from .checkpoint import save_checkpoint, load_checkpoint
from .trainer import BaseTrainer, ClassificationTrainer, \
    AugClassificationTrainer

__all__ = [
    "neg_log_llhood",
    "accuracy",
    "LOSSES",
    "METRICS",
    "make_optimizer",
    "ReduceLROnPlateau",
    "MultiStepLR",
    "make_lr_scheduler",
    "save_checkpoint",
    "load_checkpoint",
    "BaseTrainer",
    "ClassificationTrainer",
    "AugClassificationTrainer",
]
