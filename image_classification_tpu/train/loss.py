"""Losses: label-smoothed CE (hard and soft targets), focal, weighted CE,
deep-supervision combination.

torch-parity notes:
- ``nn.CrossEntropyLoss(label_smoothing=e)`` with integer targets:
  ``(1-e)*NLL + e*mean_k(-log p_k)``; with probability targets it smooths the
  target distribution: ``t' = t*(1-e) + e/K``. Both reproduced exactly.
- Class-weighted CE normalizes by the sum of selected weights (torch
  ``reduction='mean'`` semantics), reference `V3.1/train_advanced_v3.2.py:470-486`.
- Focal loss follows `V3.1/utils.py:39-61`: ``(1-pt)^gamma * CE`` with
  optional per-class alpha.
- Deep supervision (`train_advanced_v4.py:153-181`): ``0.6*CE(main) +
  (0.4/n_aux)*sum CE(aux)``; the reference **argmaxes one-hot/soft targets
  back to class indices** before the smoothed CE — discarding mixup's soft
  labels. That quirk is the parity default (``soft_targets=False``); pass
  ``soft_targets=True`` for the corrected behavior.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp


def smoothed_cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    smoothing: float = 0.0,
    class_weights: jnp.ndarray | None = None,
    reduction: str = "mean",
) -> jnp.ndarray:
    """CE with integer labels, torch semantics."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    k = logits.shape[-1]
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    smooth = -jnp.mean(logp, axis=-1)
    per = (1.0 - smoothing) * nll + smoothing * smooth
    if class_weights is not None:
        w = class_weights[labels]
        if reduction == "mean":
            return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1e-12)
        per = per * w
    if reduction == "mean":
        return jnp.mean(per)
    if reduction == "sum":
        return jnp.sum(per)
    return per


def soft_target_cross_entropy(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    smoothing: float = 0.0,
    reduction: str = "mean",
) -> jnp.ndarray:
    """CE with probability targets, torch semantics (smooths the targets)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    k = logits.shape[-1]
    t = targets * (1.0 - smoothing) + smoothing / k
    per = -jnp.sum(t * logp, axis=-1)
    if reduction == "mean":
        return jnp.mean(per)
    if reduction == "sum":
        return jnp.sum(per)
    return per


def focal_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    gamma: float = 2.0,
    alpha: jnp.ndarray | None = None,
    reduction: str = "mean",
) -> jnp.ndarray:
    ce = smoothed_cross_entropy(logits, labels, 0.0, reduction="none")
    pt = jnp.exp(-ce)
    per = (1.0 - pt) ** gamma * ce
    if alpha is not None:
        per = alpha[labels] * per
    if reduction == "mean":
        return jnp.mean(per)
    if reduction == "sum":
        return jnp.sum(per)
    return per


def deep_supervision_loss(
    outputs: Sequence[jnp.ndarray],
    targets: jnp.ndarray,
    main_weight: float = 0.6,
    smoothing: float = 0.1,
    soft_targets: bool = False,
) -> jnp.ndarray:
    """Combine main + aux head losses (`train_advanced_v4.py:153-181`)."""
    if targets.ndim == 2 and not soft_targets:
        targets = jnp.argmax(targets, axis=-1)  # the reference's quirk

    def ce(logits: jnp.ndarray) -> jnp.ndarray:
        if targets.ndim == 2:
            return soft_target_cross_entropy(logits, targets, smoothing)
        return smoothed_cross_entropy(logits, targets, smoothing)

    outputs = list(outputs)
    if len(outputs) == 1:
        return ce(outputs[0])
    total = main_weight * ce(outputs[0])
    aux_w = (1.0 - main_weight) / (len(outputs) - 1)
    for aux in outputs[1:]:
        total = total + aux_w * ce(aux)
    return total


def build_criterion(
    cfg,
    class_counts: jnp.ndarray | None = None,
    class_weights: jnp.ndarray | None = None,
) -> Callable:
    """Criterion factory mirroring `V3.1/train_advanced_v3.2.py:470-486`:
    weighted CE | focal | plain smoothed CE; deep-supervision aware.

    Returns ``loss_fn(outputs, targets)`` where outputs is a logits array or
    a tuple (deep supervision) and targets are int labels or soft labels.
    ``class_weights`` overrides the counts->weights derivation — it may be a
    TRACED array (fold-parallel threads per-fold weights through vmap).
    """
    if class_weights is None and cfg.use_weighted_loss and class_counts is not None:
        w = 1.0 / jnp.maximum(class_counts.astype(jnp.float32), 1.0)
        class_weights = w / jnp.sum(w) * len(w)

    def criterion(outputs, targets):
        is_tuple = isinstance(outputs, (tuple, list))
        if cfg.use_focal_loss:
            main = outputs[0] if is_tuple else outputs
            t = jnp.argmax(targets, -1) if targets.ndim == 2 else targets
            return focal_loss(main, t, gamma=cfg.focal_gamma, alpha=class_weights)
        if is_tuple and cfg.use_deep_supervision:
            return deep_supervision_loss(
                outputs, targets,
                main_weight=1.0 - cfg.aux_weight,
                smoothing=cfg.label_smoothing,
            )
        main = outputs[0] if is_tuple else outputs
        if targets.ndim == 2:
            return soft_target_cross_entropy(main, targets, cfg.label_smoothing)
        return smoothed_cross_entropy(
            main, targets, cfg.label_smoothing, class_weights
        )

    return criterion
