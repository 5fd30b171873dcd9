"""End-to-end smoke: synthetic 8-class dataset -> K-fold training ->
ensemble TTA inference -> submission CSV. The learning check (accuracy well
above chance on the structured synthetic task) exercises the full stack the
way the reference's held-out-validation 'oracle' did (SURVEY.md §4)."""

import os

import numpy as np
import pytest

from image_classification_tpu.core.config import Config
from image_classification_tpu.data import DataLoader, Manifest, make_synthetic_dataset
from image_classification_tpu.data.sampling import SequentialSampler
from image_classification_tpu.data.source import ArraySource
from image_classification_tpu.data.synthetic import longtail_labels, synthetic_images
from image_classification_tpu.infer import predict_ensemble, write_submission
from image_classification_tpu.train.kfold import train_k_fold


@pytest.fixture(scope="module")
def smoke_cfg(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("smoke"))
    ds = make_synthetic_dataset(
        root, n_train=160, n_test=24, num_classes=8, native_size=(24, 32), seed=3
    )
    cfg = Config(
        train_dir=ds["train_dir"],
        test_dir=ds["test_dir"],
        train_csv=ds["train_csv"],
        test_csv=ds["test_csv"],
        submission_path=os.path.join(root, "submission.csv"),
        num_classes=8,
        native_size=(24, 32),
        image_size=(32, 32),
        model_name="convnext_atto",
        use_deep_supervision=False,
        batch_size=16,
        gradient_accumulation_steps=2,
        epochs=4,
        num_folds=2,
        lr=2e-3,
        compute_dtype="float32",
        # EMA decay 0.9997 needs thousands of steps to track params; with
        # ~20 steps the shadow is still the random init, so the smoke test
        # validates raw params (EMA math is unit-tested in test_train_step).
        use_ema=False,
        use_decode_cache=False,
        model_save_path=os.path.join(root, "models"),
        output_dir=os.path.join(root, "out"),
        # keep augmentation mild so 4 epochs can learn
        distortion_prob=0.0,
        noise_blur_prob=0.0,
        color_shift_prob=0.0,
        color_jitter_prob=0.0,
        random_erasing_prob=0.0,
        mixup_alpha=0.0,
        cutmix_alpha=0.0,
        rrc_scale=(0.9, 1.0),
        ssr_prob=0.2,
        rotate_limit=10.0,
        vflip_prob=0.0,
        patience=10,
        tta_transforms=4,
    ).validate()
    return cfg, ds


def test_kfold_train_and_predict(smoke_cfg):
    cfg, ds = smoke_cfg
    results = train_k_fold(cfg)
    assert len(results) == 2
    for r in results:
        assert r.best_val_acc > 0.5  # structured task, well above 1/8 chance
        assert len(r.history) >= 1
        assert r.history[-1]["images_per_sec"] > 0

    # best-model checkpoints exist (`best_model_fold{k}`)
    for fold in (1, 2):
        assert os.path.exists(
            os.path.join(cfg.model_save_path, f"best_model_fold{fold}")
        )

    # ensemble + TTA inference -> submission
    test_manifest = Manifest.from_csv(cfg.test_csv, is_test=True)
    test_images = synthetic_images(
        np.asarray(_test_labels(ds)), native_size=(24, 32), seed=4
    )
    src = ArraySource(test_images)
    test_loader = DataLoader(
        src, test_manifest, batch_size=16,
        sampler=SequentialSampler(len(test_manifest)), pad_last=True,
    )
    bundles = [r.bundle for r in results]
    variables = [r.best_variables for r in results]
    ids, preds, probs = predict_ensemble(bundles, variables, test_loader, cfg)
    assert len(ids) == len(test_manifest) == len(preds)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-4)

    df = write_submission(ids, preds, cfg.submission_path)
    assert list(df.columns) == ["id", "predict"]
    import pandas as pd

    on_disk = pd.read_csv(cfg.submission_path)
    assert len(on_disk) == len(test_manifest)
    assert (on_disk["predict"] >= 0).all() and (on_disk["predict"] < 8).all()


def _test_labels(ds):
    return ds["test_labels"]


def test_resume_from_checkpoint(smoke_cfg):
    """Full-state resume: restart fold 1 and confirm it picks up after the
    last saved epoch instead of restarting at 0."""
    cfg, ds = smoke_cfg
    from image_classification_tpu.data.manifest import Manifest
    from image_classification_tpu.data.splits import stratified_kfold
    from image_classification_tpu.train.kfold import build_source, make_fold_loaders
    from image_classification_tpu.train.loop import train_fold

    manifest = Manifest.from_csv(cfg.train_csv, num_classes=cfg.num_classes)
    source = build_source(cfg, manifest, cfg.train_dir)
    train_idx, val_idx = next(iter(stratified_kfold(manifest.labels, 2, 42)))
    tl, vl, _ = make_fold_loaders(cfg, source, manifest, train_idx, val_idx)
    cfg_resume = cfg.replace(epochs=5)
    result = train_fold(cfg_resume, tl, vl, fold=1, resume=True)
    # resumed from epoch 4 (0-based) -> exactly 1 new epoch recorded
    assert len(result.history) == 1
    assert result.history[0]["epoch"] == 4


def test_full_default_recipe_integrates(tmp_path_factory):
    """One fold, 2 epochs, with the DEFAULT V4 recipe fully on — every aug
    stage (distortion, noise/blur, color, erasing), in-batch mixup/cutmix,
    deep supervision, EMA, grad accumulation. Catches integration regressions
    in the default path that the speed-tuned smoke tests above bypass."""
    from image_classification_tpu.data.manifest import Manifest
    from image_classification_tpu.data.splits import stratified_kfold
    from image_classification_tpu.train.kfold import build_source, make_fold_loaders
    from image_classification_tpu.train.loop import train_fold

    root = str(tmp_path_factory.mktemp("fullaug"))
    ds = make_synthetic_dataset(
        root, n_train=64, n_test=8, num_classes=6, native_size=(24, 32), seed=21
    )
    cfg = Config(  # aug/mix/EMA/DS knobs stay at their V4 defaults
        train_dir=ds["train_dir"], test_dir=ds["test_dir"],
        train_csv=ds["train_csv"], test_csv=ds["test_csv"],
        num_classes=6, native_size=(24, 32), image_size=(32, 32),
        model_name="convnext_atto",
        batch_size=16, epochs=2, num_folds=2, compute_dtype="float32",
        use_decode_cache=False,
        model_save_path=os.path.join(root, "models"),
        output_dir=os.path.join(root, "out"),
    ).validate()
    manifest = Manifest.from_csv(cfg.train_csv, num_classes=6)
    source = build_source(cfg, manifest, cfg.train_dir)
    train_idx, val_idx = next(iter(stratified_kfold(manifest.labels, 2, 42)))
    tl, vl, _ = make_fold_loaders(cfg, source, manifest, train_idx, val_idx)
    result = train_fold(cfg, tl, vl, fold=1)
    assert len(result.history) == 2
    for rec in result.history:
        assert np.isfinite(rec["train_loss"]) and np.isfinite(rec["val_loss"])
    assert os.path.exists(os.path.join(cfg.model_save_path, "best_model_fold1"))


def test_resume_is_exact_continuation(tmp_path_factory):
    """Train 4 epochs straight vs 2 + resume + 2: the post-resume epochs must
    reproduce the straight run exactly (params, optimizer, EMA, best/patience
    and plateau-scheduler state are all checkpointed — VERDICT r1 #6)."""
    from image_classification_tpu.data.manifest import Manifest
    from image_classification_tpu.data.splits import stratified_kfold
    from image_classification_tpu.train.kfold import build_source, make_fold_loaders
    from image_classification_tpu.train.loop import train_fold

    root = str(tmp_path_factory.mktemp("resume_exact"))
    ds = make_synthetic_dataset(
        root, n_train=96, n_test=8, num_classes=6, native_size=(24, 32), seed=7
    )

    def build_cfg(tag, epochs):
        return Config(
            train_dir=ds["train_dir"], test_dir=ds["test_dir"],
            train_csv=ds["train_csv"], test_csv=ds["test_csv"],
            num_classes=6, native_size=(24, 32), image_size=(32, 32),
            model_name="convnext_atto", use_deep_supervision=False,
            batch_size=16, gradient_accumulation_steps=1, epochs=epochs,
            num_folds=2, lr=2e-3, compute_dtype="float32",
            use_decode_cache=False,
            # plateau schedule: no horizon dependence on cfg.epochs, and its
            # host-side internals must survive the resume
            schedule="plateau", plateau_patience=1, plateau_factor=0.5,
            use_ema=True, ema_decay=0.5,
            distortion_prob=0.0, noise_blur_prob=0.0, color_shift_prob=0.0,
            color_jitter_prob=0.0, random_erasing_prob=0.0,
            mixup_alpha=0.0, cutmix_alpha=0.0, patience=10,
            model_save_path=os.path.join(root, tag, "models"),
            output_dir=os.path.join(root, tag, "out"),
        ).validate()

    manifest = Manifest.from_csv(ds["train_csv"], num_classes=6)

    def loaders(cfg):
        source = build_source(cfg, manifest, cfg.train_dir)
        train_idx, val_idx = next(iter(stratified_kfold(manifest.labels, 2, 42)))
        return make_fold_loaders(cfg, source, manifest, train_idx, val_idx)[:2]

    cfg_a = build_cfg("straight", 4)
    tl, vl = loaders(cfg_a)
    straight = train_fold(cfg_a, tl, vl, fold=1)

    cfg_b1 = build_cfg("resumed", 2)
    tl, vl = loaders(cfg_b1)
    train_fold(cfg_b1, tl, vl, fold=1)
    cfg_b2 = build_cfg("resumed", 4)
    tl, vl = loaders(cfg_b2)
    resumed = train_fold(cfg_b2, tl, vl, fold=1, resume=True)

    assert [r["epoch"] for r in resumed.history] == [2, 3]
    tail = straight.history[2:]
    for a, b in zip(tail, resumed.history):
        for k in ("train_loss", "train_acc", "val_loss", "val_acc"):
            assert a[k] == pytest.approx(b[k], rel=1e-5, abs=1e-7), (
                f"epoch {a['epoch']} {k}: straight={a[k]} resumed={b[k]}"
            )
    assert resumed.best_val_acc == pytest.approx(straight.best_val_acc, abs=1e-7)


def test_imbalance_swa_pipeline(tmp_path_factory):
    """V3.1/V3-style recipe end-to-end: weighted sampler + focal loss +
    minority oversampling + SWA finalization."""
    from image_classification_tpu.core.config import Config as C

    root = str(tmp_path_factory.mktemp("swa"))
    ds = make_synthetic_dataset(
        root, n_train=120, n_test=10, num_classes=6, native_size=(24, 32), seed=11
    )
    cfg = C(
        train_dir=ds["train_dir"], test_dir=ds["test_dir"],
        train_csv=ds["train_csv"], test_csv=ds["test_csv"],
        num_classes=6, native_size=(24, 32), image_size=(32, 32),
        model_name="convnext_atto", use_deep_supervision=False,
        use_ema=False, batch_size=16, gradient_accumulation_steps=2,
        epochs=3, num_folds=2, compute_dtype="float32",
        use_decode_cache=False,
        model_save_path=os.path.join(root, "models"),
        output_dir=os.path.join(root, "out"),
        distortion_prob=0.0, noise_blur_prob=0.0, color_shift_prob=0.0,
        color_jitter_prob=0.0, random_erasing_prob=0.0,
        mixup_alpha=0.0, cutmix_alpha=0.0, patience=10,
        use_sampler=True, use_focal_loss=True,
        oversample_min_samples=4,
        use_swa=True, swa_start_epoch=2,
    ).validate()
    from image_classification_tpu.data.manifest import Manifest
    from image_classification_tpu.data.splits import stratified_kfold
    from image_classification_tpu.train.kfold import build_source, make_fold_loaders
    from image_classification_tpu.train.loop import train_fold

    manifest = Manifest.from_csv(cfg.train_csv, num_classes=6)
    source = build_source(cfg, manifest, cfg.train_dir)
    tr, va = next(iter(stratified_kfold(manifest.labels, 2, 42)))
    tl, vl, train_labels = make_fold_loaders(cfg, source, manifest, tr, va)
    counts = np.bincount(train_labels, minlength=6)
    assert counts.min() >= 4  # oversampling applied
    result = train_fold(cfg, tl, vl, fold=1, class_counts=counts)
    assert len(result.history) == 3
    assert np.isfinite(result.history[-1]["train_loss"])
    assert result.best_val_acc >= 0.0


def test_save_state_cadence(smoke_cfg, monkeypatch):
    """save_state_every=2 saves at epochs 1 and 3 (final) only; async
    writer still lands every save before the fold returns."""
    from image_classification_tpu.train import loop as loop_mod
    from image_classification_tpu.utils import checkpoint as ckpt_mod

    cfg, ds = smoke_cfg
    cfg = cfg.replace(
        epochs=4, num_folds=2, save_state_every=2,
        model_save_path=cfg.model_save_path + "_cad",
        output_dir=cfg.output_dir + "_cad",
    )
    saved_epochs = []
    real_save = ckpt_mod.save_train_state

    def spy(output_dir, fold, state, epoch, cfg_, host_state=None):
        saved_epochs.append((fold, epoch))
        return real_save(output_dir, fold, state, epoch, cfg_,
                         host_state=host_state)

    monkeypatch.setattr(loop_mod.ckpt, "save_train_state", spy)
    manifest = Manifest.from_csv(cfg.train_csv, num_classes=cfg.num_classes)
    results = train_k_fold(cfg, manifest=manifest)
    assert len(results) == 2
    assert sorted(e for f, e in saved_epochs if f == 1) == [1, 3]
    # the final (epoch-3) checkpoint is durable on disk
    from image_classification_tpu.utils.checkpoint import (
        load_metadata,
        resume_path,
    )

    meta = load_metadata(resume_path(cfg.output_dir, 1))
    assert meta["epoch"] == 3
