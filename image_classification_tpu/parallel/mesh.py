"""Device-mesh abstraction — the framework's entire distributed backend.

The reference is single-process / single-GPU with no distributed training of
any kind (reference `train_advanced_v4.py:661`; its README lists distributed
support as future work). The TPU-native design instead makes *every* train /
eval step a ``jax.jit``-compiled SPMD program over a ``jax.sharding.Mesh``:

- axis ``data``  — data parallelism: the global batch is sharded along it;
  XLA inserts the gradient all-reduce over ICI automatically because
  parameters are replicated while batches are sharded.
- axis ``model`` — optional tensor parallelism for wide classifier heads /
  MLPs; size 1 by default (this workload is compute-light enough that DP is
  the right strategy, see SURVEY.md §2.4).

Single chip and N-chip slices run *identical* code: on one device the mesh is
(1, 1) and all shardings collapse to no-ops. Nothing outside this module
touches collectives directly.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
FOLD_AXIS = "fold"


@dataclass(frozen=True)
class MeshSpec:
    """How to lay devices out. ``data=-1`` means "all devices not used by
    other axes". ``fold > 1`` adds a leading fold-parallel axis (train K
    cross-validation folds simultaneously, one mesh slice each — a strategy
    the single-GPU reference cannot express; see train/foldpar.py)."""

    data: int = -1
    model: int = 1
    fold: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int, int]:
        model = max(1, self.model)
        fold = max(1, self.fold)
        data = self.data
        if data == -1:
            if n_devices % (model * fold) != 0:
                raise ValueError(
                    f"{n_devices} devices not divisible by "
                    f"model={model} x fold={fold}"
                )
            data = n_devices // (model * fold)
        if fold * data * model != n_devices:
            raise ValueError(
                f"mesh {fold}x{data}x{model} != device count {n_devices}"
            )
        return fold, data, model


def build_mesh(
    spec: MeshSpec | None = None, devices: Sequence[jax.Device] | None = None
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    spec = spec or MeshSpec()
    fold, data, model = spec.resolve(len(devices))
    if fold > 1:
        dev_array = np.asarray(devices).reshape(fold, data, model)
        return Mesh(dev_array, (FOLD_AXIS, DATA_AXIS, MODEL_AXIS))
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dimension across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def fold_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for stacked per-fold batches (K, B, ...): fold dim over the
    fold axis, batch dim over the data axis."""
    return NamedSharding(mesh, P(FOLD_AXIS, DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays: Any) -> Any:
    """Device-put host arrays with the batch dimension sharded over ``data``.

    Replaces the reference's per-batch ``images.to(device)`` H2D copies
    (`train_advanced_v4.py:211-213`) with an async sharded transfer.
    """
    sharding = batch_sharding(mesh)
    out = tuple(jax.device_put(a, sharding) for a in arrays)
    return out if len(out) != 1 else out[0]


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def check_batch_divisible(batch_size: int, mesh: Mesh) -> None:
    n_data = mesh.shape[DATA_AXIS]
    if batch_size % n_data != 0:
        raise ValueError(
            f"global batch {batch_size} not divisible by data-parallel "
            f"size {n_data}"
        )
