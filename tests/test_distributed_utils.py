import numpy as np

from image_classification_tpu.parallel.distributed import (
    host_local_batch_to_global,
    host_shard_indices,
    initialize,
    num_hosts,
)


def test_single_host_noop():
    initialize()  # must be a no-op without coordinator env
    assert num_hosts() == 1


def test_host_shard_indices_single():
    np.testing.assert_array_equal(host_shard_indices(10), np.arange(10))


def test_host_local_batch_single(eight_device_mesh):
    from image_classification_tpu.parallel import batch_sharding

    sharding = batch_sharding(eight_device_mesh)
    x = np.arange(16 * 2, dtype=np.float32).reshape(16, 2)
    g = host_local_batch_to_global(sharding, x)
    np.testing.assert_array_equal(np.asarray(g), x)
    assert g.sharding == sharding
