from image_classification_tpu.ops.dwconv import depthwise_conv7x7, pallas_available

__all__ = ["depthwise_conv7x7", "pallas_available"]
