"""Explicit PRNG-key plumbing.

Replaces the reference's global-RNG seeding (`train_advanced_v4.py:35-43`
``seed_everything``) with JAX's functional key threading: one root key per
run, deterministically folded per fold / epoch / step / purpose. Every
stochastic component (augmentation draws, mixup, dropout, sampling) receives
its own key; there is no hidden state, so runs are reproducible bit-for-bit
regardless of host thread timing — a determinism guarantee the reference
could not make (it set ``cudnn.deterministic=True`` *and*
``cudnn.benchmark=True``, `train_advanced_v4.py:42-43`).
"""

from __future__ import annotations

import hashlib

import jax
import numpy as np


def root_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def _tag_to_int(tag: str) -> int:
    # Stable across processes (unlike hash()).
    return int.from_bytes(hashlib.sha256(tag.encode()).digest()[:4], "little")


def fold_name(key: jax.Array, tag: str) -> jax.Array:
    """Fold a string tag into a key, e.g. fold_name(k, 'augment')."""
    return jax.random.fold_in(key, _tag_to_int(tag))


def fold(key: jax.Array, *indices: int | jax.Array) -> jax.Array:
    for ix in indices:
        key = jax.random.fold_in(key, ix)
    return key


def epoch_key(key: jax.Array, fold_idx: int, epoch: int) -> jax.Array:
    return fold(key, fold_idx, epoch)


def numpy_seed(key: jax.Array) -> int:
    """Derive a numpy-compatible 32-bit seed from a JAX key (for host-side
    shuffling / sampling that runs in numpy for speed)."""
    data = jax.random.key_data(key)
    return int(np.asarray(data).ravel()[-1]) & 0x7FFFFFFF
