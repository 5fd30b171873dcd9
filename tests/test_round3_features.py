"""Round-3 feature closures: best-loss checkpoint tier (`example.py:380-390`),
the V3.1 holdout single-split trainer (`V3.1/train_advanced_v3.2.py:539-544`),
in-epoch `log_interval` progress logging (`V3.1/...:182-187`), and
dataset-computed normalization stats (`example.py:119-135`)."""

import json
import logging
import os

import numpy as np
import pytest

from image_classification_tpu.core.config import Config
from image_classification_tpu.data import make_synthetic_dataset
from image_classification_tpu.train.kfold import train_k_fold
from image_classification_tpu.utils import checkpoint as ckpt


@pytest.fixture(scope="module")
def holdout_run(tmp_path_factory):
    """One tiny holdout-mode training run shared by several assertions
    (each compiled step costs ~tens of seconds on CPU)."""
    root = str(tmp_path_factory.mktemp("holdout"))
    ds = make_synthetic_dataset(
        root, n_train=120, n_test=10, num_classes=6, native_size=(24, 32), seed=5
    )
    cfg = Config(
        train_dir=ds["train_dir"], test_dir=ds["test_dir"],
        train_csv=ds["train_csv"], test_csv=ds["test_csv"],
        num_classes=6, native_size=(24, 32), image_size=(32, 32),
        model_name="convnext_atto", use_deep_supervision=False,
        batch_size=16, gradient_accumulation_steps=1,
        epochs=2, lr=2e-3, compute_dtype="float32", use_ema=False,
        use_decode_cache=False,
        split_mode="holdout", val_fraction=0.25,
        log_interval=2,
        distortion_prob=0.0, noise_blur_prob=0.0, color_shift_prob=0.0,
        color_jitter_prob=0.0, random_erasing_prob=0.0,
        mixup_alpha=0.0, cutmix_alpha=0.0, patience=10,
        model_save_path=os.path.join(root, "models"),
        output_dir=os.path.join(root, "out"),
    ).validate()
    logging.getLogger("ic_tpu").setLevel(logging.INFO)

    records = []

    class Capture(logging.Handler):
        def emit(self, rec):
            records.append(rec.getMessage())

    h = Capture()
    logging.getLogger("ic_tpu").addHandler(h)
    try:
        results = train_k_fold(cfg)
    finally:
        logging.getLogger("ic_tpu").removeHandler(h)
    return cfg, results, records


def test_holdout_single_split(holdout_run):
    cfg, results, _ = holdout_run
    # exactly ONE training run (no K-fold), saved as fold 1
    assert len(results) == 1
    assert results[0].fold == 1
    assert len(results[0].history) == 2
    assert os.path.exists(os.path.join(cfg.model_save_path, "best_model_fold1"))
    # 25% of the (>=2-per-class oversampled) set went to validation
    # -> train batches exist and val metrics are finite
    assert np.isfinite(results[0].history[-1]["val_loss"])


def test_best_loss_tier_saved(holdout_run):
    cfg, results, _ = holdout_run
    loss_path = ckpt.best_path(cfg.model_save_path, 1, metric="loss")
    assert os.path.exists(loss_path)
    meta = ckpt.load_metadata(loss_path)
    assert meta["metric"] == "loss"
    assert np.isfinite(meta["val_loss"])
    # the loss-tier checkpoint carries the epoch with the LOWEST val loss
    min_loss = min(h["val_loss"] for h in results[0].history)
    assert meta["val_loss"] == pytest.approx(min_loss, rel=1e-6)
    # acc tier records val_loss too
    acc_meta = ckpt.load_metadata(ckpt.best_path(cfg.model_save_path, 1))
    assert "val_loss" in acc_meta and "val_acc" in acc_meta


def test_log_interval_emits_progress(holdout_run):
    _, _, records = holdout_run
    step_lines = [m for m in records if " step " in m and "img/s" in m]
    assert step_lines, f"no in-epoch progress lines in {records[:20]}"
    # line carries loss/acc/lr
    assert "loss" in step_lines[0] and "lr" in step_lines[0]


def test_select_best_fold_by_loss(tmp_path):
    params = {"w": np.ones((2, 2), np.float32)}
    ckpt.save_best(str(tmp_path), 1, params, None, 0.8, val_loss=0.50, metric="loss")
    ckpt.save_best(str(tmp_path), 2, params, None, 0.7, val_loss=0.31, metric="loss")
    ckpt.save_best(str(tmp_path), 3, params, None, 0.9, val_loss=0.62, metric="loss")
    fold, loss = ckpt.select_best_fold(str(tmp_path), [1, 2, 3], metric="loss")
    assert fold == 2
    assert loss == pytest.approx(0.31)
    # acc tier untouched by loss-tier saves
    ckpt.save_best(str(tmp_path), 1, params, None, 0.8)
    ckpt.save_best(str(tmp_path), 2, params, None, 0.9)
    fold, acc = ckpt.select_best_fold(str(tmp_path), [1, 2], metric="acc")
    assert (fold, acc) == (2, pytest.approx(0.9))


def test_load_best_loss_tier_roundtrip(tmp_path):
    params = {"w": np.arange(4, dtype=np.float32).reshape(2, 2)}
    ckpt.save_best(str(tmp_path), 1, params, None, 0.5, val_loss=1.2, metric="loss")
    tree, meta = ckpt.load_best(str(tmp_path), 1, {"params": params}, metric="loss")
    np.testing.assert_array_equal(tree["params"]["w"], params["w"])
    assert meta["val_loss"] == pytest.approx(1.2)


def test_norm_stats_dataset_computed_and_cached(tmp_path):
    from image_classification_tpu.data.source import ArraySource
    from image_classification_tpu.data.stats import resolve_norm_stats

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, size=(50, 8, 8, 3)).astype(np.uint8)

    class KeyedSource(ArraySource):
        def _cache_key(self):
            return "testkey"

    src = KeyedSource(imgs)
    cfg = Config(norm_stats="dataset", cache_dir=str(tmp_path)).validate()
    out = resolve_norm_stats(cfg, src)
    expect_mean = imgs.astype(np.float64).mean(axis=(0, 1, 2)) / 255.0
    np.testing.assert_allclose(out.mean, expect_mean, atol=1e-6)
    assert out.std[0] > 0
    # cached: a second resolve reads the JSON (mutate it to prove the read)
    cache_file = os.path.join(str(tmp_path), "channel_stats_testkey.json")
    assert os.path.exists(cache_file)
    with open(cache_file, "w") as f:
        json.dump({"mean": [0.1, 0.2, 0.3], "std": [0.4, 0.5, 0.6]}, f)
    out2 = resolve_norm_stats(cfg, src)
    assert out2.mean == (0.1, 0.2, 0.3)
    assert out2.std == (0.4, 0.5, 0.6)


def test_norm_stats_imagenet_passthrough():
    from image_classification_tpu.data.stats import resolve_norm_stats

    cfg = Config().validate()
    assert resolve_norm_stats(cfg, None) is cfg


def test_config_validates_new_fields():
    with pytest.raises(ValueError):
        Config(split_mode="bogus").validate()
    with pytest.raises(ValueError):
        Config(val_fraction=1.5).validate()
    with pytest.raises(ValueError):
        Config(norm_stats="bogus").validate()


def test_warp_impl_plumbing_and_mesh_demotion():
    from image_classification_tpu.aug.pipeline import _warp_impl, aug_configs_from

    with pytest.raises(ValueError):
        Config(warp_impl="bogus").validate()
    cfg = Config(warp_impl="pallas", mesh_data=1, mesh_model=1).validate()
    # round 4: _warp_impl returns (impl, shard_mesh)
    assert _warp_impl(cfg) == ("pallas", None)
    assert aug_configs_from(cfg)["geometry"].warp_impl == "pallas"
    # non-trivial mesh, no concrete Mesh given: demoted (tp-capable GSPMD
    # path; dp-only meshes keep pallas via shard_map — test_warp_sharded)
    cfg_mesh = Config(warp_impl="pallas", mesh_data=4, mesh_model=2).validate()
    assert _warp_impl(cfg_mesh) == ("xla", None)
    # default stays xla
    assert _warp_impl(Config(mesh_data=1, mesh_model=1).validate()) == (
        "xla", None,
    )
