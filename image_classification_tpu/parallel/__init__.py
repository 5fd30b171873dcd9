from image_classification_tpu.parallel import distributed
from image_classification_tpu.parallel.mesh import (
    MeshSpec,
    build_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    DATA_AXIS,
    MODEL_AXIS,
)

__all__ = [
    "MeshSpec",
    "build_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "DATA_AXIS",
    "MODEL_AXIS",
]
