"""Stratified K-fold orchestration — the top of the training stack.

Mirrors `train_k_fold` (`train_advanced_v4.py:562-655`): read the manifest,
log the class distribution, split with StratifiedKFold(seed 42), and per
fold build loaders (val batch = 2x train, `:618`), a fresh model/optimizer,
and run the fold trainer; per-fold failures are logged and skipped
(`:651-653`). Adds the V3.1 imbalance tools behind flags: minority
oversampling (`train_advanced_v4.py:527-560` / `V3.1/...:521-536`) and
inverse-frequency weighted sampling (`V3.1/...:253-296`).

The decoded-image store is built ONCE over the full manifest; folds index
into it (no per-fold decode).
"""

from __future__ import annotations

import logging
import os
from typing import Any

import numpy as np

from image_classification_tpu.data.loader import DataLoader, device_cache_wanted
from image_classification_tpu.data.manifest import (
    Manifest,
    distribution_stats,
    verify_images,
)
from image_classification_tpu.data.sampling import (
    SequentialSampler,
    ShuffleSampler,
    WeightedSampler,
    inverse_frequency_weights,
)
from image_classification_tpu.data.source import ImageSource
from image_classification_tpu.data.splits import (
    oversample_minority,
    stratified_kfold,
    stratified_split,
)
from image_classification_tpu.train.loop import FoldResult, train_fold

logger = logging.getLogger("ic_tpu")


def build_source(cfg, manifest: Manifest, img_dir: str) -> ImageSource:
    return ImageSource(
        img_dir,
        manifest.ids,
        native_size=tuple(cfg.native_size),
        cache_dir=cfg.cache_dir if cfg.use_decode_cache else None,
    )


def make_fold_loaders(
    cfg, source, manifest: Manifest, train_idx, val_idx, mesh=None
):
    train_labels = manifest.labels[train_idx]
    if cfg.oversample_min_samples > 0:
        extra = oversample_minority(
            train_labels, cfg.oversample_min_samples, seed=cfg.seed
        )
        train_idx = train_idx[extra]
        train_labels = manifest.labels[train_idx]
    if cfg.use_sampler:
        sampler: Any = WeightedSampler(
            inverse_frequency_weights(train_labels), seed=cfg.seed
        )
    else:
        sampler = ShuffleSampler(len(train_idx), seed=cfg.seed)
    cache = device_cache_wanted(cfg, source)
    train_loader = DataLoader(
        source, manifest, indices=train_idx, batch_size=cfg.batch_size,
        sampler=sampler, drop_last=True, pad_last=False, mesh=mesh,
        prefetch_depth=cfg.prefetch_depth, device_cache=cache,
    )
    val_loader = DataLoader(
        source, manifest, indices=val_idx,
        batch_size=cfg.batch_size * cfg.val_batch_multiplier,
        sampler=SequentialSampler(len(val_idx)), pad_last=True, mesh=mesh,
        prefetch_depth=cfg.prefetch_depth, device_cache=cache,
    )
    return train_loader, val_loader, train_labels


def train_ensemble(
    cfg,
    manifest: Manifest | None = None,
    source=None,
    mesh=None,
    resume: bool = False,
) -> tuple[list[FoldResult], list[float]]:
    """Multi-architecture ensemble training (reference
    `previous/V2-convbase/config.py:46-51`: e.g. ConvNeXt + ViT + DeiT with
    weights [.4,.3,.3]). Runs the full K-fold per architecture; returns all
    fold results plus per-result ensemble weights (architecture weight
    split evenly across its folds)."""
    names = list(cfg.ensemble_models) or [cfg.model_name]
    arch_weights = list(cfg.ensemble_weights) or [1.0] * len(names)
    if len(arch_weights) != len(names):
        raise ValueError("ensemble_weights length must match ensemble_models")
    if manifest is None:
        manifest = Manifest.from_csv(cfg.train_csv, num_classes=cfg.num_classes)
    if source is None:
        source = build_source(cfg, manifest, cfg.train_dir)
    results: list[FoldResult] = []
    weights: list[float] = []
    for name, aw in zip(names, arch_weights):
        logger.info("ensemble member: %s (weight %.2f)", name, aw)
        arch_cfg = cfg.replace(
            model_name=name,
            model_save_path=f"{cfg.model_save_path}/{name}",
            output_dir=f"{cfg.output_dir}/{name}",
        )
        arch_results = train_k_fold(
            arch_cfg, manifest=manifest, source=source, mesh=mesh, resume=resume
        )
        results.extend(arch_results)
        weights.extend([aw / max(1, len(arch_results))] * len(arch_results))
    return results, weights


def train_k_fold(
    cfg,
    manifest: Manifest | None = None,
    source=None,
    mesh=None,
    resume: bool = False,
    model_name: str | None = None,
    shared: dict | None = None,
) -> list[FoldResult]:
    """``shared``: optional dict carrying compiled steps across calls.
    Reuse is gated on the full program signature (train/loop.py
    ``program_sig``), so callers may pass one dict across *different*
    configs — e.g. the in-process ladder runner (tools/run_hard_ladder.py)
    — and only truly identical programs share executables."""
    if manifest is None:
        manifest = Manifest.from_csv(cfg.train_csv, num_classes=cfg.num_classes)
    logger.info(
        "class distribution: %s",
        distribution_stats(manifest.labels, cfg.num_classes),
    )
    # Upfront image verification (`previous/V1-effb0/dataset.py:92-107`):
    # report missing files before training starts; the loader substitutes
    # fallback images for them, so this warns rather than aborts.
    missing = verify_images(manifest, cfg.train_dir)
    if missing:
        logger.warning(
            "%d/%d train images missing on disk (first 10: %s); "
            "fallback images will be substituted",
            len(missing), len(manifest), missing[:10],
        )
    if source is None:
        source = build_source(cfg, manifest, cfg.train_dir)
    if cfg.norm_stats == "dataset":
        from image_classification_tpu.data.stats import resolve_norm_stats

        # save_to: the stats ship with the checkpoints so `predict` on a
        # machine without the training data normalizes identically
        cfg = resolve_norm_stats(
            cfg, source,
            save_to=os.path.join(cfg.model_save_path, "norm_stats.json"),
        )
    results: list[FoldResult] = []
    if shared is None:
        shared = {}  # compiled steps reused across folds (see train_fold)
    if cfg.split_mode == "holdout":
        # V3.1 single-split trainer (`V3.1/train_advanced_v3.2.py:539-544`):
        # oversample ultra-rare classes to >=2 pre-split so stratification
        # is possible (`V3.1/...:521-536`), then ONE stratified split. The
        # rest of the stack treats it as a 1-fold run (checkpoints land as
        # fold 1).
        base = oversample_minority(manifest.labels, 2, seed=cfg.seed)
        tr, va = stratified_split(
            manifest.labels[base], cfg.val_fraction, seed=cfg.seed
        )
        splits: Any = [(base[tr], base[va])]
        logger.info(
            "holdout split: train %d / val %d (val_fraction %.2f)",
            len(tr), len(va), cfg.val_fraction,
        )
    else:
        splits = stratified_kfold(
            manifest.labels, cfg.num_folds, seed=cfg.fold_seed
        )
    if cfg.fold_parallel:
        from image_classification_tpu.train.foldpar import train_k_fold_parallel

        def make_loaders(fold, train_idx, val_idx):
            t, v, _ = make_fold_loaders(
                cfg, source, manifest, train_idx, val_idx, mesh=None
            )
            return t, v

        return train_k_fold_parallel(
            cfg, splits, make_loaders, mesh, model_name=model_name,
            resume=resume,
        )
    n_total = 1 if cfg.split_mode == "holdout" else cfg.num_folds
    for fold, (train_idx, val_idx) in enumerate(splits, start=1):
        logger.info(
            "fold %d/%d: train %d / val %d",
            fold, n_total, len(train_idx), len(val_idx),
        )
        try:
            train_loader, val_loader, train_labels = make_fold_loaders(
                cfg, source, manifest, train_idx, val_idx, mesh=mesh
            )
            class_counts = np.bincount(train_labels, minlength=cfg.num_classes)
            result = train_fold(
                cfg, train_loader, val_loader, fold=fold,
                class_counts=class_counts, resume=resume,
                model_name=model_name, shared=shared, mesh=mesh,
            )
            results.append(result)
            logger.info("fold %d done: best val acc %.4f", fold, result.best_val_acc)
        except KeyboardInterrupt:
            raise
        except Exception:
            # parity with the reference's per-fold tolerance
            # (`train_advanced_v4.py:651-653`) — but log the full trace.
            logger.exception("fold %d failed; continuing", fold)
            continue
    return results
