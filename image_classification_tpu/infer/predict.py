"""Ensemble inference and submission writing.

Reproduces `predict` (`train_advanced_v4.py:349-381`): every fold-model (or
multi-architecture ensemble member, `previous/V2-convbase/config.py:46-51`)
predicts each batch — softmax (with optional TTA averaging) — predictions
are stacked and averaged (optionally weighted), argmaxed, and written as a
reference-compatible CSV: ``id,predict`` (`testdata.py:166-173`) or
``id,target`` (`train_advanced_v4.py:704-712`).
"""

from __future__ import annotations

import logging
from typing import Any, Sequence

import jax
import numpy as np
import pandas as pd

from image_classification_tpu.infer.tta import get_tta
from image_classification_tpu.train.step import make_predict_step

logger = logging.getLogger("ic_tpu")


def predict_ensemble(
    bundles: Sequence[Any],
    variables_list: Sequence[dict],
    test_loader,
    cfg,
    weights: Sequence[float] | None = None,
) -> tuple[list[str], np.ndarray, np.ndarray]:
    """Returns (image_ids, predictions, mean probabilities)."""
    if not bundles:
        logger.error("no models available for prediction")
        return [], np.array([]), np.array([])
    tta = get_tta(cfg)
    steps = [
        jax.jit(make_predict_step(b, cfg, tta)) for b in bundles
    ]
    if weights is None:
        w = np.ones(len(bundles)) / len(bundles)
    else:
        w = np.asarray(weights, dtype=np.float64)
        w = w / w.sum()
    ids: list[str] = []
    all_probs: list[np.ndarray] = []
    id_iter = test_loader.batch_ids()
    for batch, batch_ids in zip(test_loader, id_iter):
        probs = None
        for wi, (step, variables) in enumerate(zip(steps, variables_list)):
            p = np.asarray(step(variables, batch["image"]))
            probs = p * w[wi] if probs is None else probs + p * w[wi]
        mask = np.asarray(batch["mask"])
        probs = probs[mask]
        all_probs.append(probs)
        ids.extend(str(i) for i in batch_ids)
    probs = np.concatenate(all_probs) if all_probs else np.zeros((0, cfg.num_classes))
    preds = probs.argmax(axis=1)
    return ids, preds, probs


def write_submission(
    ids: Sequence[str],
    preds: np.ndarray,
    path: str,
    column: str = "predict",
) -> pd.DataFrame:
    """``id,predict`` (testdata.py) or ``id,target`` (v4 main) layout."""
    df = pd.DataFrame({"id": list(ids), column: np.asarray(preds, dtype=int)})
    df.to_csv(path, index=False)
    logger.info("wrote %d predictions -> %s", len(df), path)
    return df
