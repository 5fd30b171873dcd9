import numpy as np
import pytest

from image_classification_tpu.data import (
    DataLoader,
    ImageSource,
    Manifest,
    ShuffleSampler,
    WeightedSampler,
    inverse_frequency_weights,
    make_synthetic_dataset,
    oversample_minority,
    stratified_kfold,
    stratified_split,
)
from image_classification_tpu.data.manifest import distribution_stats, verify_images
from image_classification_tpu.data.source import ArraySource
from image_classification_tpu.data.synthetic import longtail_labels, synthetic_images


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    return make_synthetic_dataset(str(root), n_train=120, n_test=30, seed=0)


def test_manifest_roundtrip(ds):
    m = Manifest.from_csv(ds["train_csv"], num_classes=44)
    assert len(m) == 120
    assert m.labels.min() >= 0 and m.labels.max() < 44
    stats = distribution_stats(m.labels, 44)
    assert stats["num_samples"] == 120
    missing = verify_images(m, ds["train_dir"])
    assert missing == []


def test_manifest_test_mode(ds):
    m = Manifest.from_csv(ds["test_csv"], is_test=True)
    assert (m.labels == -1).all()


def test_stratified_kfold_matches_sklearn():
    from sklearn.model_selection import StratifiedKFold

    labels = longtail_labels(300, 10, seed=3)
    ours = list(stratified_kfold(labels, 3, seed=42))
    theirs = list(
        StratifiedKFold(n_splits=3, shuffle=True, random_state=42).split(
            np.zeros(len(labels)), labels
        )
    )
    for (a, b), (c, d) in zip(ours, theirs):
        np.testing.assert_array_equal(a, c)
        np.testing.assert_array_equal(b, d)


def test_stratified_split_preserves_classes():
    labels = np.repeat(np.arange(10), 20)
    tr, va = stratified_split(labels, val_fraction=0.1, seed=0)
    assert len(tr) == 180 and len(va) == 20
    assert set(labels[va]) == set(range(10))


def test_oversample_minority():
    labels = np.array([0] * 50 + [1] * 3 + [2] * 1)
    idx = oversample_minority(labels, min_samples=10, seed=0)
    new_labels = labels[idx]
    counts = np.bincount(new_labels)
    assert counts[0] == 50 and counts[1] == 10 and counts[2] == 10
    # original samples all kept, in order, first
    np.testing.assert_array_equal(idx[: len(labels)], np.arange(len(labels)))


def test_inverse_frequency_weights():
    labels = np.array([0, 0, 0, 1])
    w = inverse_frequency_weights(labels)
    assert w[3] == pytest.approx(3 * w[0])
    assert w.sum() == pytest.approx(1.0)


def test_weighted_sampler_balances():
    labels = np.array([0] * 900 + [1] * 100)
    s = WeightedSampler(inverse_frequency_weights(labels), seed=0)
    idx = s.epoch_indices(0)
    frac1 = (labels[idx] == 1).mean()
    assert 0.4 < frac1 < 0.6  # balanced despite 9:1 imbalance


def test_shuffle_sampler_deterministic():
    s = ShuffleSampler(100, seed=1)
    np.testing.assert_array_equal(s.epoch_indices(5), s.epoch_indices(5))
    assert not np.array_equal(s.epoch_indices(0), s.epoch_indices(1))


def test_image_source_decode_and_cache(ds, tmp_path):
    m = Manifest.from_csv(ds["train_csv"])
    src = ImageSource(
        ds["train_dir"], m.ids, native_size=(60, 80), cache_dir=str(tmp_path)
    )
    batch = src.get_batch(np.array([0, 1, 2]))
    assert batch.shape == (3, 60, 80, 3) and batch.dtype == np.uint8
    assert batch.std() > 1  # actually decoded something
    # second instance must hit the cache (decoding again would also pass, so
    # check the marker file exists)
    src2 = ImageSource(
        ds["train_dir"], m.ids, native_size=(60, 80), cache_dir=str(tmp_path)
    )
    np.testing.assert_array_equal(src2.get_batch(np.array([5])), src.get_batch(np.array([5])))


def test_image_source_black_fallback(ds):
    m = Manifest(np.array(["nope1", "nope2"], dtype=object), np.array([0, 1]))
    src = ImageSource(ds["train_dir"], m.ids, native_size=(60, 80))
    batch = src.get_batch(np.array([0, 1]))
    assert (batch == 0).all()


def test_image_source_random_fallback(ds):
    m = Manifest(np.array(["nope1"], dtype=object), np.array([0]))
    src = ImageSource(ds["train_dir"], m.ids, native_size=(60, 80), fallback="random")
    assert src.get_batch(np.array([0])).std() > 1


def test_loader_epoch(ds):
    m = Manifest.from_csv(ds["train_csv"])
    labels = m.labels
    src = ArraySource(synthetic_images(labels, seed=0))
    dl = DataLoader(
        src, m, batch_size=32, sampler=ShuffleSampler(len(m), seed=0), pad_last=True
    )
    batches = list(dl)
    assert len(batches) == len(dl) == 4
    total_valid = sum(b["mask"].sum() for b in batches)
    assert total_valid == 120
    last = batches[-1]
    assert last["image"].shape == (32, 60, 80, 3)
    assert not last["mask"][-1]  # padded
    # every sample appears exactly once
    seen = np.concatenate([b["index"][b["mask"]] for b in batches])
    np.testing.assert_array_equal(np.sort(seen), np.arange(120))


def test_loader_drop_last(ds):
    m = Manifest.from_csv(ds["train_csv"])
    src = ArraySource(synthetic_images(m.labels, seed=0))
    dl = DataLoader(src, m, batch_size=32, drop_last=True, pad_last=False)
    batches = list(dl)
    assert len(batches) == 3
    assert all(b["image"].shape[0] == 32 for b in batches)


def test_loader_sharded(ds, eight_device_mesh):
    m = Manifest.from_csv(ds["train_csv"])
    src = ArraySource(synthetic_images(m.labels, seed=0))
    dl = DataLoader(src, m, batch_size=16, drop_last=True, mesh=eight_device_mesh)
    batch = next(iter(dl))
    assert batch["image"].shape == (16, 60, 80, 3)
    shard_shapes = {s.data.shape for s in batch["image"].addressable_shards}
    assert shard_shapes == {(2, 60, 80, 3)}


def test_loader_subset_indices(ds):
    m = Manifest.from_csv(ds["train_csv"])
    src = ArraySource(synthetic_images(m.labels, seed=0))
    sub = np.arange(0, 120, 2)
    dl = DataLoader(src, m, indices=sub, batch_size=16, pad_last=True)
    seen = np.concatenate([b["index"][b["mask"]] for b in dl])
    np.testing.assert_array_equal(np.sort(seen), sub)


def test_loader_device_cache_matches_host_path(ds):
    """HBM-resident gather path yields bit-identical batches to the host
    assembly path (incl. zeroed padding rows on the ragged final batch)."""
    m = Manifest.from_csv(ds["train_csv"])
    src = ArraySource(synthetic_images(m.labels, seed=0))
    sub = np.arange(0, 110)  # ragged: 110 = 3*32 + 14
    kw = dict(indices=sub, batch_size=32, pad_last=True)
    host = list(DataLoader(src, m, **kw))
    dev = list(DataLoader(src, m, device_cache=True, **kw))
    assert len(host) == len(dev) == 4
    for hb, db in zip(host, dev):
        np.testing.assert_array_equal(hb["image"], np.asarray(db["image"]))
        np.testing.assert_array_equal(hb["label"], np.asarray(db["label"]))
        np.testing.assert_array_equal(hb["mask"], np.asarray(db["mask"]))
        np.testing.assert_array_equal(hb["index"], db["index"])


def test_loader_device_cache_disabled_on_multidevice_mesh(ds, eight_device_mesh):
    m = Manifest.from_csv(ds["train_csv"])
    src = ArraySource(synthetic_images(m.labels, seed=0))
    dl = DataLoader(
        src, m, batch_size=16, drop_last=True, mesh=eight_device_mesh,
        device_cache=True,
    )
    assert not dl._cache_active()  # falls back to the host path
    batch = next(iter(dl))
    shard_shapes = {s.data.shape for s in batch["image"].addressable_shards}
    assert shard_shapes == {(2, 60, 80, 3)}


def test_device_cache_wanted_resolution(ds):
    from image_classification_tpu.core.config import Config
    from image_classification_tpu.data.loader import device_cache_wanted

    m = Manifest.from_csv(ds["train_csv"])
    src = ArraySource(synthetic_images(m.labels, seed=0))
    assert device_cache_wanted(Config(hbm_cache="on"), src)
    assert not device_cache_wanted(Config(hbm_cache="off"), src)
    assert device_cache_wanted(Config(hbm_cache="auto"), src)  # tiny store
    assert not device_cache_wanted(
        Config(hbm_cache="auto", hbm_cache_limit_mb=0), src
    )


def test_chunked_device_upload_stitches_exactly():
    """The chunked upload (tunnel workaround, see source.py) must reproduce
    the array exactly across chunk boundaries, including a ragged tail."""
    from image_classification_tpu.data.source import _chunked_device_upload

    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, size=(70, 64, 64, 3)).astype(np.uint8)
    # ~12 KB rows; 1 MB chunks -> 85-row chunks... force multiple chunks by
    # computing with the real row size: 64*64*3 = 12288 B -> 85 rows/MB
    dev = _chunked_device_upload(data, chunk_mb=1)  # 1 chunk (70 < 85)
    np.testing.assert_array_equal(np.asarray(dev), data)
    big = rng.integers(0, 256, size=(200, 64, 64, 3)).astype(np.uint8)
    dev = _chunked_device_upload(big, chunk_mb=1)  # 3 chunks: 85+85+30
    np.testing.assert_array_equal(np.asarray(dev), big)
