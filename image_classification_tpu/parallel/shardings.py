"""Parameter sharding rules: data parallel + Megatron-style tensor parallel.

DP is the required strategy for this workload (SURVEY.md §2.4): params
replicated, batch sharded over ``data``; XLA inserts the gradient all-reduce
over ICI. When the ``model`` axis is >1, the wide MLP weights additionally
shard Megatron-style: fc1 column-parallel (output dim), fc2 row-parallel
(input dim) — GSPMD then keeps the intermediate activation sharded and
inserts a single all-reduce per MLP pair. Everything else stays replicated
(convs here are small relative to MLPs).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from image_classification_tpu.parallel.mesh import DATA_AXIS, FOLD_AXIS, MODEL_AXIS

# param-name -> which kernel axis to shard over the model axis
_COL_PARALLEL = ("mlp_fc1",)   # shard output dim
_ROW_PARALLEL = ("mlp_fc2",)   # shard input dim


def param_spec(path: tuple, leaf: Any, model_size: int) -> P:
    if model_size <= 1:
        return P()
    names = [getattr(p, "key", str(p)) for p in path]
    leaf_name = names[-1] if names else ""
    parent = names[-2] if len(names) >= 2 else ""
    ndim = getattr(leaf, "ndim", 0)
    if leaf_name == "kernel" and ndim == 2:
        if parent in _COL_PARALLEL and leaf.shape[1] % model_size == 0:
            return P(None, MODEL_AXIS)
        if parent in _ROW_PARALLEL and leaf.shape[0] % model_size == 0:
            return P(MODEL_AXIS, None)
    if leaf_name == "bias" and ndim == 1 and parent in _COL_PARALLEL:
        if leaf.shape[0] % model_size == 0:
            return P(MODEL_AXIS)
    return P()


def param_shardings(params: Any, mesh: Mesh) -> Any:
    model_size = mesh.shape[MODEL_AXIS]
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, param_spec(path, leaf, model_size)),
        params,
    )


def state_shardings(state: Any, mesh: Mesh) -> Any:
    """Shardings for a full TrainState.

    One uniform rule applied to *every* leaf by its path: optimizer moments
    (mu/nu), EMA, and SWA trees all carry the parameter path as a suffix, so
    they automatically inherit the parameter's spec — keeping param-shaped
    state co-sharded with its param (no per-step resharding). Scalars and
    everything unmatched replicate.
    """
    model_size = mesh.shape[MODEL_AXIS]
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, param_spec(path, leaf, model_size)),
        state,
    )


def batch_spec() -> P:
    return P(DATA_AXIS)


def fold_state_shardings(stacked_state: Any, mesh: Mesh) -> Any:
    """Shardings for a fold-stacked TrainState (every leaf has a leading
    fold dimension of size K). The fold dim shards over ``fold``; the
    remaining dims reuse :func:`param_spec` evaluated on the per-fold shape,
    so tensor-parallel MLP sharding composes with fold parallelism."""
    model_size = mesh.shape[MODEL_AXIS]

    class _View:  # param_spec only reads .ndim/.shape
        __slots__ = ("shape", "ndim")

        def __init__(self, shape):
            self.shape = shape
            self.ndim = len(shape)

    def one(path, leaf):
        if getattr(leaf, "ndim", 0) < 1:
            return NamedSharding(mesh, P())
        inner = param_spec(path, _View(leaf.shape[1:]), model_size)
        return NamedSharding(mesh, P(FOLD_AXIS, *inner))

    return jax.tree_util.tree_map_with_path(one, stacked_state)
