"""Metrics: running averages, accuracy, per-class F1, confusion matrix.

``AverageMeter`` mirrors the reference utility (`train_advanced_v4.py:45-60`).
Per-class F1 / macro-F1 / confusion matrix close the observability gap the
reference documented but never implemented (its `progress.md:348-378`).
All array math is jnp so it can run on device inside jitted eval.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class AverageMeter:
    """Tracks current value, running sum, count, and average."""

    def __init__(self) -> None:
        self.reset()

    def reset(self) -> None:
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1) -> None:
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / max(1, self.count)


def accuracy_top1(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean top-1 accuracy. ``labels`` may be integer or one-hot/soft."""
    if labels.ndim == 2:
        labels = jnp.argmax(labels, axis=-1)
    return jnp.mean(jnp.argmax(logits, axis=-1) == labels)


def confusion_matrix(
    preds: jnp.ndarray, labels: jnp.ndarray, num_classes: int
) -> jnp.ndarray:
    """(num_classes, num_classes) matrix with rows = true class."""
    idx = labels.astype(jnp.int32) * num_classes + preds.astype(jnp.int32)
    counts = jnp.bincount(idx, length=num_classes * num_classes)
    return counts.reshape(num_classes, num_classes)


def per_class_f1(cm: jnp.ndarray) -> jnp.ndarray:
    """Per-class F1 from a confusion matrix; classes with no support and no
    predictions get F1 = 0 (sklearn's zero_division=0 convention)."""
    cm = jnp.asarray(cm, jnp.float64 if cm.dtype == jnp.int64 else jnp.float32)
    tp = jnp.diagonal(cm)
    fp = cm.sum(axis=0) - tp
    fn = cm.sum(axis=1) - tp
    denom = 2 * tp + fp + fn
    return jnp.where(denom > 0, 2 * tp / jnp.maximum(denom, 1e-12), 0.0)


def macro_f1(cm: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(per_class_f1(cm))


def classification_report(
    cm: np.ndarray, class_names: list[str] | None = None
) -> str:
    """Human-readable per-class precision/recall/F1/support table."""
    cm = np.asarray(cm)
    n = cm.shape[0]
    names = class_names or [str(i) for i in range(n)]
    tp = np.diagonal(cm).astype(np.float64)
    fp = cm.sum(axis=0) - tp
    fn = cm.sum(axis=1) - tp
    support = cm.sum(axis=1)
    prec = np.where(tp + fp > 0, tp / np.maximum(tp + fp, 1), 0.0)
    rec = np.where(tp + fn > 0, tp / np.maximum(tp + fn, 1), 0.0)
    f1 = np.where(prec + rec > 0, 2 * prec * rec / np.maximum(prec + rec, 1e-12), 0.0)
    lines = [f"{'class':>8} {'prec':>7} {'rec':>7} {'f1':>7} {'support':>8}"]
    for i in range(n):
        lines.append(
            f"{names[i]:>8} {prec[i]:7.4f} {rec[i]:7.4f} {f1[i]:7.4f} {int(support[i]):8d}"
        )
    lines.append(
        f"{'macro':>8} {prec.mean():7.4f} {rec.mean():7.4f} {f1.mean():7.4f} "
        f"{int(support.sum()):8d}"
    )
    return "\n".join(lines)
