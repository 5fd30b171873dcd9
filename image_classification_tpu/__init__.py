"""TPU-native image-classification training framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
PyTorch project ``Garhlz/image_classification`` (44-class, heavily imbalanced,
60x80-px image classification): ConvNeXt / EfficientNet / ViT backbones, a
fully on-device batched augmentation pipeline, a single jitted train step
(grad accumulation, clipping, AdamW + warmup-cosine, EMA, bf16), stratified
K-fold orchestration with early stopping, full-state checkpoint/resume, and
fold-ensemble + TTA inference producing reference-compatible submission CSVs.

Everything scales from one chip to a multi-chip slice through a single
``jax.sharding.Mesh`` abstraction (see ``image_classification_tpu.parallel``).
"""

__version__ = "0.1.0"

from image_classification_tpu.core.config import Config

__all__ = ["Config", "__version__"]
