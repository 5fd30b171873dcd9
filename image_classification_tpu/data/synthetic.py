"""Synthetic 44-class dataset generator for tests and benchmarks.

Produces class-dependent structured images (gradient + per-class frequency
pattern + noise) so a model can actually learn the task in smoke tests.
Matches the real dataset's shape facts: 60x80 uint8 RGB, long-tailed label
distribution (reference `progress.md:8-15`).
"""

from __future__ import annotations

import os

import cv2
import numpy as np
import pandas as pd


def synthetic_images(
    labels: np.ndarray,
    native_size: tuple[int, int] = (60, 80),
    seed: int = 0,
) -> np.ndarray:
    h, w = native_size
    rng = np.random.default_rng(seed)
    n = len(labels)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    images = np.empty((n, h, w, 3), dtype=np.uint8)
    for i, cls in enumerate(labels):
        phase = 2 * np.pi * cls / 44.0
        fx, fy = 1 + cls % 7, 1 + cls % 5
        base = (
            127
            + 60 * np.sin(2 * np.pi * fx * xx / w + phase)
            + 60 * np.cos(2 * np.pi * fy * yy / h + phase)
        )
        img = np.stack(
            [base, np.roll(base, cls % h, axis=0), np.roll(base, cls % w, axis=1)],
            axis=-1,
        )
        img = img + rng.normal(0, 10, size=img.shape)
        images[i] = np.clip(img, 0, 255).astype(np.uint8)
    return images


def longtail_labels(
    n: int, num_classes: int = 44, seed: int = 0, imbalance: float = 50.0
) -> np.ndarray:
    """Long-tailed label draw (most-common / least-common ~= imbalance)."""
    rng = np.random.default_rng(seed)
    weights = np.exp(-np.log(imbalance) * np.arange(num_classes) / (num_classes - 1))
    p = weights / weights.sum()
    if n <= num_classes:
        return np.arange(num_classes)[:n].astype(np.int64)
    labels = rng.choice(num_classes, size=n - num_classes, p=p)
    # guarantee every class has at least one sample
    return np.concatenate([np.arange(num_classes), labels]).astype(np.int64)


def make_synthetic_dataset(
    root: str,
    n_train: int = 200,
    n_test: int = 50,
    num_classes: int = 44,
    native_size: tuple[int, int] = (60, 80),
    seed: int = 0,
    write_images: bool = True,
) -> dict:
    """Create train/test JPEG directories + CSVs mirroring the reference's
    layout (train.csv: id,target — sample_submission.csv: id,predict)."""
    os.makedirs(root, exist_ok=True)
    train_dir = os.path.join(root, "train")
    test_dir = os.path.join(root, "test")
    labels = longtail_labels(n_train, num_classes, seed)
    test_labels = longtail_labels(n_test, num_classes, seed + 1)
    train_ids = [f"tr{i:05d}" for i in range(n_train)]
    test_ids = [f"te{i:05d}" for i in range(n_test)]
    if write_images:
        os.makedirs(train_dir, exist_ok=True)
        os.makedirs(test_dir, exist_ok=True)
        for ids, labs, d, s in (
            (train_ids, labels, train_dir, seed),
            (test_ids, test_labels, test_dir, seed + 1),
        ):
            imgs = synthetic_images(labs, native_size, s)
            for i, id_ in enumerate(ids):
                cv2.imwrite(
                    os.path.join(d, f"{id_}.jpg"),
                    cv2.cvtColor(imgs[i], cv2.COLOR_RGB2BGR),
                )
    train_csv = os.path.join(root, "train.csv")
    test_csv = os.path.join(root, "sample_submission.csv")
    pd.DataFrame({"id": train_ids, "target": labels}).to_csv(train_csv, index=False)
    pd.DataFrame({"id": test_ids, "predict": 0}).to_csv(test_csv, index=False)
    return {
        "train_dir": train_dir,
        "test_dir": test_dir,
        "train_csv": train_csv,
        "test_csv": test_csv,
        "train_labels": labels,
        "test_labels": test_labels,
    }
