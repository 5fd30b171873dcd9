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


def _make_loader(n, batch, k=None, h=None):
    from image_classification_tpu.data import DataLoader, Manifest
    from image_classification_tpu.data.sampling import SequentialSampler
    from image_classification_tpu.data.source import ArraySource

    rng = np.random.default_rng(5)
    images = rng.integers(0, 256, size=(n, 8, 10, 3)).astype(np.uint8)
    man = Manifest(
        ids=np.array([f"im{i}" for i in range(n)]),
        labels=rng.integers(0, 4, size=n).astype(np.int64),
    )
    return DataLoader(
        ArraySource(images), man, batch_size=batch,
        sampler=SequentialSampler(n), pad_last=True, prefetch_depth=0,
        process_index=k, process_count=h,
    )


def test_multihost_loader_slices_reassemble():
    """Two mocked hosts' local slices concatenated == the single-host batch,
    including the padded (mask=False) tail of a ragged final batch."""
    n, batch, h = 22, 8, 2
    ref = list(_make_loader(n, batch)._batches())
    host_iters = [list(_make_loader(n, batch, k=k, h=h)._batches()) for k in range(h)]
    assert len(ref) == len(host_iters[0]) == len(host_iters[1]) == 3
    for b_idx, ref_b in enumerate(ref):
        img = np.concatenate([host_iters[k][b_idx]["image"] for k in range(h)])
        lab = np.concatenate([host_iters[k][b_idx]["label"] for k in range(h)])
        msk = np.concatenate([host_iters[k][b_idx]["mask"] for k in range(h)])
        np.testing.assert_array_equal(img, ref_b["image"])
        np.testing.assert_array_equal(lab, ref_b["label"])
        np.testing.assert_array_equal(msk, ref_b["mask"])
    # each host materialized only its slice
    assert host_iters[0][0]["image"].shape[0] == batch // h


def test_multihost_loader_requires_divisible_batch():
    import pytest

    loader = _make_loader(16, 9, k=0, h=2)
    with pytest.raises(ValueError):
        next(iter(loader._batches()))
