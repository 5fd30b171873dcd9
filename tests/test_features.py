"""Progressive resizing and multi-architecture ensemble training."""

import os

import numpy as np
import pytest

from image_classification_tpu.core.config import Config
from image_classification_tpu.data import make_synthetic_dataset


@pytest.fixture(scope="module")
def tiny_ds(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("feat"))
    return make_synthetic_dataset(
        root, n_train=80, n_test=10, num_classes=4, native_size=(24, 32), seed=5
    ), root


def base_cfg(ds, root, **kw):
    d = dict(
        train_dir=ds["train_dir"],
        test_dir=ds["test_dir"],
        train_csv=ds["train_csv"],
        test_csv=ds["test_csv"],
        num_classes=4,
        native_size=(24, 32),
        image_size=(32, 32),
        model_name="convnext_atto",
        use_deep_supervision=False,
        use_ema=False,
        batch_size=16,
        gradient_accumulation_steps=2,
        epochs=2,
        num_folds=2,
        compute_dtype="float32",
        use_decode_cache=False,
        model_save_path=os.path.join(root, "models"),
        output_dir=os.path.join(root, "out"),
        distortion_prob=0.0,
        noise_blur_prob=0.0,
        color_shift_prob=0.0,
        color_jitter_prob=0.0,
        random_erasing_prob=0.0,
        mixup_alpha=0.0,
        cutmix_alpha=0.0,
        patience=10,
    )
    d.update(kw)
    return Config(**d).validate()


def test_progressive_resizing_runs(tiny_ds):
    ds, root = tiny_ds
    cfg = base_cfg(
        ds, root, progressive_resizing=True, progressive_scales=(0.5, 1.0),
        model_save_path=os.path.join(root, "models_prog"),
        output_dir=os.path.join(root, "out_prog"),
    )
    from image_classification_tpu.data.manifest import Manifest
    from image_classification_tpu.data.splits import stratified_kfold
    from image_classification_tpu.train.kfold import build_source, make_fold_loaders
    from image_classification_tpu.train.loop import train_fold

    manifest = Manifest.from_csv(cfg.train_csv, num_classes=4)
    source = build_source(cfg, manifest, cfg.train_dir)
    tr, va = next(iter(stratified_kfold(manifest.labels, 2, 42)))
    tl, vl, _ = make_fold_loaders(cfg, source, manifest, tr, va)
    result = train_fold(cfg, tl, vl, fold=1)
    assert len(result.history) == 2
    assert np.isfinite(result.history[0]["train_loss"])
    assert np.isfinite(result.history[1]["train_loss"])


def test_ensemble_training(tiny_ds):
    ds, root = tiny_ds
    cfg = base_cfg(
        ds, root,
        epochs=1,
        num_folds=2,
        ensemble_models=("convnext_atto", "convnext_femto"),
        ensemble_weights=(0.6, 0.4),
        model_save_path=os.path.join(root, "models_ens"),
        output_dir=os.path.join(root, "out_ens"),
    )
    from image_classification_tpu.train.kfold import train_ensemble

    results, weights = train_ensemble(cfg)
    assert len(results) == 4  # 2 archs x 2 folds
    assert len(weights) == 4
    assert weights[0] == pytest.approx(0.3)  # 0.6 split over 2 folds
    assert weights[2] == pytest.approx(0.2)
    names = {r.bundle.name for r in results}
    assert names == {"convnext_atto", "convnext_femto"}
    # per-arch checkpoints in separate directories
    assert os.path.exists(
        os.path.join(root, "models_ens", "convnext_atto", "best_model_fold1")
    )
    assert os.path.exists(
        os.path.join(root, "models_ens", "convnext_femto", "best_model_fold2")
    )
