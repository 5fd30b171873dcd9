from image_classification_tpu.models.factory import (
    create_model,
    list_models,
    ModelBundle,
)
from image_classification_tpu.models.convnext import ConvNeXt
from image_classification_tpu.models.efficientnet import EfficientNet
from image_classification_tpu.models.vit import VisionTransformer
from image_classification_tpu.models.deep_supervision import DeepSupervisionModel

__all__ = [
    "create_model",
    "list_models",
    "ModelBundle",
    "ConvNeXt",
    "EfficientNet",
    "VisionTransformer",
    "DeepSupervisionModel",
]
