from image_classification_tpu.aug.pipeline import (
    train_augment,
    eval_preprocess,
    normalize,
    resize_bilinear,
)
from image_classification_tpu.aug.mix import mixup_cutmix_batch, one_hot_labels

__all__ = [
    "train_augment",
    "eval_preprocess",
    "normalize",
    "resize_bilinear",
    "mixup_cutmix_batch",
    "one_hot_labels",
]
