"""Fold and split logic.

Stratified K-fold reproduces the reference's
``StratifiedKFold(n_splits, shuffle=True, random_state=42)``
(`train_advanced_v4.py:572-575`) exactly — we call sklearn directly, since it
is a host-side, one-shot index computation with no device involvement.
Stratified train/val split mirrors `V3.1/train_advanced_v3.2.py:539-544`;
the two oversampling schemes mirror `train_advanced_v4.py:527-560` (pad rare
classes to ``min_samples``) and `V3.1/...:521-536` (ensure >=2 samples so the
stratified split can work).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
from sklearn.model_selection import StratifiedKFold, train_test_split


def stratified_kfold(
    labels: np.ndarray, num_folds: int, seed: int = 42
) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Yields (train_idx, val_idx) per fold, identical to the reference's
    splitter given identical label arrays."""
    kf = StratifiedKFold(n_splits=num_folds, shuffle=True, random_state=seed)
    dummy = np.zeros(len(labels))
    yield from kf.split(dummy, labels)


def stratified_split(
    labels: np.ndarray, val_fraction: float = 0.1, seed: int = 42
) -> tuple[np.ndarray, np.ndarray]:
    idx = np.arange(len(labels))
    train_idx, val_idx = train_test_split(
        idx, test_size=val_fraction, stratify=labels, random_state=seed
    )
    return np.sort(train_idx), np.sort(val_idx)


def oversample_minority(
    labels: np.ndarray,
    min_samples: int,
    seed: int = 42,
) -> np.ndarray:
    """Return indices (original order first, duplicates appended) such that
    every class has at least ``min_samples`` entries.

    Semantics follow `train_advanced_v4.py:527-560`: for each class below the
    threshold, append enough resampled duplicates to reach ``min_samples``.
    Classes with fewer samples than the deficit sample with replacement
    (the reference crashes in that corner; we do the intended thing).
    """
    rng = np.random.default_rng(seed)
    out = [np.arange(len(labels))]
    counts = np.bincount(labels)
    for cls in np.nonzero((counts > 0) & (counts < min_samples))[0]:
        cls_idx = np.nonzero(labels == cls)[0]
        need = min_samples - len(cls_idx)
        extra = rng.choice(cls_idx, size=need, replace=need > len(cls_idx))
        out.append(extra)
    return np.concatenate(out)


def assign_fold_column(
    labels: np.ndarray, num_folds: int, seed: int = 42
) -> np.ndarray:
    """Per-sample fold id, the notebook-pipeline pattern
    (`example.py:109-113`)."""
    folds = np.full(len(labels), -1, dtype=np.int64)
    for k, (_, val_idx) in enumerate(stratified_kfold(labels, num_folds, seed)):
        folds[val_idx] = k
    return folds
