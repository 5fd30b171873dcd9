from image_classification_tpu.utils.metrics import (
    AverageMeter,
    accuracy_top1,
    confusion_matrix,
    per_class_f1,
    macro_f1,
)
from image_classification_tpu.utils.logging import setup_logging

__all__ = [
    "AverageMeter",
    "accuracy_top1",
    "confusion_matrix",
    "per_class_f1",
    "macro_f1",
    "setup_logging",
]
