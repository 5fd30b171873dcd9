from image_classification_tpu.data.manifest import Manifest, class_distribution
from image_classification_tpu.data.splits import (
    stratified_kfold,
    stratified_split,
    oversample_minority,
)
from image_classification_tpu.data.sampling import (
    ShuffleSampler,
    WeightedSampler,
    SequentialSampler,
    inverse_frequency_weights,
)
from image_classification_tpu.data.source import ImageSource
from image_classification_tpu.data.loader import DataLoader
from image_classification_tpu.data.synthetic import make_synthetic_dataset

__all__ = [
    "Manifest",
    "class_distribution",
    "stratified_kfold",
    "stratified_split",
    "oversample_minority",
    "ShuffleSampler",
    "WeightedSampler",
    "SequentialSampler",
    "inverse_frequency_weights",
    "ImageSource",
    "DataLoader",
    "make_synthetic_dataset",
]
