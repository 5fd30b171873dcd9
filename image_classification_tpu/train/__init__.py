from image_classification_tpu.train.loss import (
    smoothed_cross_entropy,
    soft_target_cross_entropy,
    focal_loss,
    deep_supervision_loss,
    build_criterion,
)
from image_classification_tpu.train.schedule import (
    warmup_cosine_schedule,
    PlateauScheduler,
)
from image_classification_tpu.train.train_state import TrainState, create_train_state
from image_classification_tpu.train.step import make_train_step, make_eval_step
from image_classification_tpu.train.loop import train_fold, FoldResult
from image_classification_tpu.train.kfold import train_k_fold

__all__ = [
    "smoothed_cross_entropy",
    "soft_target_cross_entropy",
    "focal_loss",
    "deep_supervision_loss",
    "build_criterion",
    "warmup_cosine_schedule",
    "PlateauScheduler",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "train_fold",
    "FoldResult",
    "train_k_fold",
]
