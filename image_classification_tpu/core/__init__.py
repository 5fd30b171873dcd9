from image_classification_tpu.core.config import Config, load_config
from image_classification_tpu.core import prng

__all__ = ["Config", "load_config", "prng"]
