"""Epoch index samplers.

Replaces torch's DataLoader shuffle / ``WeightedRandomSampler``
(`V3.1/train_advanced_v3.2.py:253-296`: inverse-frequency weights, sampling
with replacement, shuffle disabled when the sampler is on;
`previous/V1-effb0/train.py:167-180`). Samplers are pure functions of
(epoch, seed) so any epoch's exact batch order can be reproduced — needed
for deterministic resume mid-training.
"""

from __future__ import annotations

import numpy as np


def inverse_frequency_weights(labels: np.ndarray) -> np.ndarray:
    """Per-sample weight 1/class_count, normalized to sum to 1
    (`V3.1/train_advanced_v3.2.py:262-276`)."""
    counts = np.bincount(labels)
    w = 1.0 / counts[labels]
    return w / w.sum()


class SequentialSampler:
    def __init__(self, n: int):
        self.n = n

    def epoch_indices(self, epoch: int) -> np.ndarray:
        return np.arange(self.n)


class ShuffleSampler:
    def __init__(self, n: int, seed: int = 42):
        self.n = n
        self.seed = seed

    def epoch_indices(self, epoch: int) -> np.ndarray:
        rng = np.random.default_rng((self.seed, epoch))
        return rng.permutation(self.n)


class WeightedSampler:
    """Sampling with replacement proportional to per-sample weights; draws
    ``n`` indices per epoch like torch's WeightedRandomSampler with
    num_samples=len(dataset)."""

    def __init__(self, weights: np.ndarray, seed: int = 42, num_samples: int | None = None):
        w = np.asarray(weights, dtype=np.float64)
        self.p = w / w.sum()
        self.num_samples = num_samples or len(w)
        self.seed = seed

    def epoch_indices(self, epoch: int) -> np.ndarray:
        rng = np.random.default_rng((self.seed, epoch))
        return rng.choice(len(self.p), size=self.num_samples, replace=True, p=self.p)
