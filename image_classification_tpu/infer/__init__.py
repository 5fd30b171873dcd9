from image_classification_tpu.infer.tta import tta_views_scale4, tta_views_flip6, get_tta
from image_classification_tpu.infer.predict import (
    predict_ensemble,
    write_submission,
)

__all__ = [
    "tta_views_scale4",
    "tta_views_flip6",
    "get_tta",
    "predict_ensemble",
    "write_submission",
]
