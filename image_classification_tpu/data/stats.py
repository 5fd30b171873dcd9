"""Dataset channel statistics.

The notebook pipeline computed per-dataset channel mean/std over the train
set and normalized with those instead of ImageNet stats
(`example.py:119-135`, hardcoded result mean≈(.854,.836,.830),
std≈(.235,.250,.254); also `V3.1/transforms.py:14-17`). This computes them
exactly (two-pass, float64 accumulation) from any image source.
"""

from __future__ import annotations

import numpy as np


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
