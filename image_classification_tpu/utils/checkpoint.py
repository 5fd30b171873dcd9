"""Checkpointing: full-state resume + best-model weights.

Two tiers, like the reference intended:
- ``save_best`` / ``load_best``: weights-only best-val checkpoints with
  metadata (val_acc, fold) — `train_advanced_v4.py:464-469`'s
  ``best_model_fold{k}.pth``.
- ``save_train_state`` / ``load_train_state``: the FULL TrainState
  (params, optimizer, EMA, BN stats, SWA, step) + epoch + config for true
  mid-run resume — the capability `V3.1/utils.py:63-93` defined but never
  wired; here the trainer actually calls it.

Orbax handles the array tree IO (async-capable, multi-host-safe); metadata
goes in a JSON sidecar.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import orbax.checkpoint as ocp


def _ckptr() -> ocp.PyTreeCheckpointer:
    return ocp.PyTreeCheckpointer()


class AsyncCheckpointWriter:
    """Runs checkpoint jobs on a background thread, one at a time.

    The device->host pull of a full TrainState (~1.4 GB) through a slow
    host link can take minutes (docs/PERF_NOTES.md epoch-overhead
    attribution); with the device arrays snapshotted first (see
    ``snapshot_device_tree``), the pull + disk write overlap the next
    epoch's training. ``submit`` joins any pending job first, so at most
    one save is in flight and writes land in submission order. Exceptions
    from a job re-raise on the next ``join``/``submit``.
    """

    def __init__(self) -> None:
        self._thread = None
        self._err: BaseException | None = None

    def submit(self, fn, *args, **kwargs) -> None:
        self.join()

        def run() -> None:
            try:
                fn(*args, **kwargs)
            except BaseException as e:  # surfaced on join
                self._err = e

        import threading

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def join(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._err is not None:
            err, self._err = self._err, None
            raise err


def snapshot_device_tree(tree: Any) -> Any:
    """Device-side copy of every jax.Array leaf (host leaves pass through).

    The train step donates its input state, so a checkpoint job running
    concurrently with further training must read from its own buffers; an
    on-device copy is ~ms while the host pull it decouples is ~minutes.
    """
    import jax.numpy as jnp

    def copy(leaf: Any) -> Any:
        return jnp.array(leaf, copy=True) if isinstance(leaf, jax.Array) else leaf

    return jax.tree.map(copy, tree)


def save_tree(path: str, tree: Any, metadata: dict | None = None) -> None:
    """Crash-safe save: write to a temp sibling, then swap into place.

    ``save_train_state`` runs every epoch; deleting the old checkpoint
    before the new one is durable would leave no resume point if the
    process dies mid-save (ADVICE r1). The previous checkpoint survives at
    ``<path>.prev`` until the new one is fully written.
    """
    import shutil

    path = os.path.abspath(path)
    tmp, prev = path + ".tmp", path + ".prev"
    for stale in (tmp, prev):
        if os.path.exists(stale):
            shutil.rmtree(stale)
    _ckptr().save(tmp, tree)
    if metadata is not None:
        with open(os.path.join(tmp, "metadata.json"), "w") as f:
            json.dump(metadata, f, indent=2, default=str)
    if os.path.exists(path):
        os.rename(path, prev)
    os.rename(tmp, path)
    if os.path.exists(prev):
        shutil.rmtree(prev)


def load_tree(path: str, template: Any) -> Any:
    """Restore array leaves as host numpy (device placement/sharding is the
    caller's job — restoring as jax.Array would require sharding specs)."""
    import numpy as np

    path = os.path.abspath(path)
    restore_args = jax.tree.map(
        lambda x: ocp.RestoreArgs(restore_type=np.ndarray)
        if hasattr(x, "shape")
        else ocp.RestoreArgs(restore_type=type(x)),
        template,
    )
    return _ckptr().restore(path, item=template, restore_args=restore_args)


def load_metadata(path: str) -> dict:
    meta = os.path.join(os.path.abspath(path), "metadata.json")
    if not os.path.exists(meta):
        return {}
    with open(meta) as f:
        return json.load(f)


# --------------------------------------------------------------- best model

def best_path(save_dir: str, fold: int, metric: str = "acc") -> str:
    """Two best-model tiers, like the notebook pipeline
    (`example.py:380-390` saves best-score AND best-loss checkpoints):
    ``metric='acc'`` is the V4 tier (`best_model_fold{k}`,
    `train_advanced_v4.py:464-469`); ``metric='loss'`` the lowest-val-loss
    tier."""
    prefix = "best_model" if metric == "acc" else "best_loss_model"
    return os.path.join(save_dir, f"{prefix}_fold{fold}")


def save_best(
    save_dir: str,
    fold: int,
    params: Any,
    batch_stats: Any,
    val_acc: float,
    val_loss: float | None = None,
    metric: str = "acc",
) -> str:
    """Weights-only best checkpoint (`train_advanced_v4.py:464-469`;
    best-loss tier `example.py:380-390`)."""
    path = best_path(save_dir, fold, metric)
    tree = {"params": params}
    if batch_stats is not None:
        tree["batch_stats"] = batch_stats
    meta = {"val_acc": float(val_acc), "fold": fold, "metric": metric}
    if val_loss is not None:
        meta["val_loss"] = float(val_loss)
    save_tree(path, tree, meta)
    return path


def load_best(
    save_dir: str, fold: int, template: dict, metric: str = "acc"
) -> tuple[dict, dict]:
    path = best_path(save_dir, fold, metric)
    return load_tree(path, template), load_metadata(path)


def select_best_fold(
    save_dir: str, folds: list[int], metric: str = "acc"
) -> tuple[int, float]:
    """Pick the fold checkpoint with the best stored metric — the notebook
    pipeline's best-checkpoint selection (`example.py:452-460`). With
    ``metric='acc'`` highest val_acc wins; with ``metric='loss'`` lowest
    val_loss wins (from the best-loss tier)."""
    sign = 1.0 if metric == "acc" else -1.0
    key = "val_acc" if metric == "acc" else "val_loss"
    best_fold, best_score = None, -float("inf")
    for fold in folds:
        meta = load_metadata(best_path(save_dir, fold, metric))
        if key not in meta:
            continue
        score = sign * float(meta[key])
        if score > best_score:
            best_fold, best_score = fold, score
    if best_fold is None:
        raise FileNotFoundError(
            f"no fold checkpoint under {save_dir!r} carries {key!r} "
            f"(folds {folds}, tier {metric!r}) — was the run saved with "
            f"save_best_loss enabled?" if metric == "loss" else
            f"no fold checkpoint under {save_dir!r} carries {key!r} "
            f"(folds {folds})"
        )
    return best_fold, sign * best_score


# --------------------------------------------------------------- full state

def resume_path(output_dir: str, fold: int) -> str:
    return os.path.join(output_dir, f"train_state_fold{fold}")


def save_train_state(
    output_dir: str,
    fold: int,
    state: Any,
    epoch: int,
    cfg: Any,
    host_state: dict | None = None,
) -> str:
    """Full-state epoch checkpoint.

    ``host_state`` carries the trainer's host-side bookkeeping
    (best_val_acc, patience_counter, plateau-scheduler internals, …) so a
    resumed fold reproduces the exact continuation — the intent of
    `V3.1/utils.py:63-93` (model+optimizer+scheduler+epoch), which the
    reference defined but never wired.
    """
    path = resume_path(output_dir, fold)
    save_tree(
        path,
        state,
        {
            "epoch": epoch,
            "fold": fold,
            "config": cfg.to_dict(),
            "host_state": host_state or {},
        },
    )
    return path


def load_train_state(
    output_dir: str, fold: int, template: Any
) -> tuple[Any, int, dict] | None:
    """Returns (state, next_epoch, host_state) or None when no checkpoint
    exists. Falls back to the ``.prev`` sibling if a crash interrupted the
    last save after the old checkpoint was moved aside."""
    path = resume_path(output_dir, fold)
    if not os.path.exists(path) and os.path.exists(path + ".prev"):
        os.rename(path + ".prev", path)
    if not os.path.exists(path):
        return None
    meta = load_metadata(path)
    state = load_tree(path, template)
    return state, int(meta.get("epoch", -1)) + 1, meta.get("host_state", {})
