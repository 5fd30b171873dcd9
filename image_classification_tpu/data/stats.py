"""Dataset channel statistics.

The notebook pipeline computed per-dataset channel mean/std over the train
set and normalized with those instead of ImageNet stats
(`example.py:119-135`, hardcoded result mean≈(.854,.836,.830),
std≈(.235,.250,.254); also `V3.1/transforms.py:14-17`). This computes them
exactly (two-pass, float64 accumulation) from any image source.
"""

from __future__ import annotations

import json
import logging
import os

import numpy as np

logger = logging.getLogger("ic_tpu")


def compute_channel_stats(
    source, batch_size: int = 1024
) -> tuple[tuple[float, float, float], tuple[float, float, float]]:
    """Returns (mean, std) per RGB channel on the 0..1 scale."""
    n = len(source)
    total = np.zeros(3, np.float64)
    total_sq = np.zeros(3, np.float64)
    count = 0
    for start in range(0, n, batch_size):
        idx = np.arange(start, min(start + batch_size, n))
        batch = source.get_batch(idx).astype(np.float64) / 255.0
        total += batch.sum(axis=(0, 1, 2))
        total_sq += (batch ** 2).sum(axis=(0, 1, 2))
        count += batch.shape[0] * batch.shape[1] * batch.shape[2]
    mean = total / count
    var = total_sq / count - mean ** 2
    std = np.sqrt(np.maximum(var, 0.0))
    return tuple(float(m) for m in mean), tuple(float(s) for s in std)


def resolve_norm_stats(cfg, source, save_to: str | None = None) -> "cfg":
    """Apply ``cfg.norm_stats``: with ``"dataset"``, compute (and cache)
    train-set channel stats and return a config with mean/std replaced —
    the notebook pipeline's normalization (`example.py:119-135`). With
    ``"imagenet"`` (default) the config passes through unchanged.

    The stats are cached as JSON in ``cfg.cache_dir`` keyed by the source's
    decode-cache key, so training and later standalone inference resolve the
    exact same values. ``save_to``: additionally write the resolved stats to
    a stable path (the trainer passes ``model_save_path/norm_stats.json`` so
    checkpoints ship with their normalization and standalone inference never
    needs the training data — see cli.cmd_predict).
    """
    if cfg.norm_stats == "imagenet":
        return cfg
    key = source._cache_key() if hasattr(source, "_cache_key") else None
    path = (
        os.path.join(cfg.cache_dir, f"channel_stats_{key}.json")
        if key is not None
        else None
    )
    if path is not None and os.path.exists(path):
        with open(path) as f:
            stats = json.load(f)
        mean, std = tuple(stats["mean"]), tuple(stats["std"])
        logger.info("dataset channel stats (cached): mean=%s std=%s", mean, std)
    else:
        mean, std = compute_channel_stats(source)
        logger.info("dataset channel stats (computed): mean=%s std=%s", mean, std)
        if path is not None:
            os.makedirs(cfg.cache_dir, exist_ok=True)
            with open(path, "w") as f:
                json.dump({"mean": mean, "std": std}, f)
    if save_to is not None:
        os.makedirs(os.path.dirname(save_to) or ".", exist_ok=True)
        with open(save_to, "w") as f:
            json.dump({"mean": mean, "std": std}, f)
    return cfg.replace(mean=mean, std=std)


def load_saved_norm_stats(cfg, path: str) -> "cfg | None":
    """Load stats written by ``resolve_norm_stats(save_to=...)`` — the
    checkpoint-resident normalization for standalone inference. Returns the
    updated config, or None when the file doesn't exist."""
    if not os.path.exists(path):
        return None
    with open(path) as f:
        stats = json.load(f)
    mean, std = tuple(stats["mean"]), tuple(stats["std"])
    logger.info("dataset channel stats (from %s): mean=%s std=%s",
                path, mean, std)
    return cfg.replace(mean=mean, std=std)
