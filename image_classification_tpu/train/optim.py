"""Optimizer construction.

AdamW with torch-parity defaults: betas (0.9, 0.999), eps 1e-8, and weight
decay applied to **all** parameters — torch ``optim.AdamW(model.parameters())``
(`train_advanced_v4.py:504-510`) does not exempt norms/biases, so neither
do we. Gradient clipping is global-norm over the whole
tree before the update (`train_advanced_v4.py:226-229`). Layer freezing
(`V3.1/train_advanced_v3.2.py:399-403`) zeroes updates for matching
parameter subtrees.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from image_classification_tpu.train.fused import ScheduledTx


def _freeze_label_fn(freeze_stages: int) -> Callable:
    """Label params 'frozen' for stem + the first ``freeze_stages`` stages."""

    def label(path: tuple, _leaf) -> str:
        keys = [getattr(p, "key", str(p)) for p in path]
        name = keys[1] if keys and keys[0] == "backbone" and len(keys) > 1 else (
            keys[0] if keys else ""
        )
        if name.startswith("stem"):
            return "frozen"
        for s in range(freeze_stages):
            if name.startswith((f"stage{s}_", f"downsample{s}_")):
                return "frozen"
        return "train"

    return label


def build_optimizer(
    cfg,
    lr_schedule: Callable | float,
) -> optax.GradientTransformation:
    if cfg.optimizer.lower() != "adamw":
        raise ValueError(f"Unsupported optimizer {cfg.optimizer!r}")
    if cfg.schedule == "plateau":
        # dynamic LR: the host-side PlateauScheduler rewrites the injected
        # hyperparameter between epochs (see set_learning_rate)
        adamw = optax.inject_hyperparams(optax.adamw)(
            learning_rate=float(lr_schedule) if not callable(lr_schedule) else cfg.lr,
            b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_eps,
            weight_decay=cfg.weight_decay,
        )
    else:
        adamw = optax.adamw(
            learning_rate=lr_schedule,
            b1=cfg.adam_b1,
            b2=cfg.adam_b2,
            eps=cfg.adam_eps,
            weight_decay=cfg.weight_decay,
        )
    core = optax.chain(
        optax.clip_by_global_norm(cfg.gradient_clip_val)
        if cfg.gradient_clip_val > 0
        else optax.identity(),
        adamw,
    )
    core = _with_freeze(core, cfg)
    # Attach the schedule so the jitted step can run the single-pass fused
    # clip+AdamW+EMA update (train/fused.py) without any signature change;
    # plateau mode injects LR from the host instead, so nothing to attach.
    if cfg.schedule == "plateau":
        schedule = None
    elif callable(lr_schedule):
        schedule = lr_schedule
    else:  # constant LR ("none"): fuse as a constant schedule
        lr_const = float(lr_schedule)
        schedule = lambda count: jnp.asarray(lr_const, jnp.float32)  # noqa: E731
    return ScheduledTx(init=core.init, update=core.update, schedule=schedule)


def set_learning_rate(opt_state, lr: float):
    """Rewrite the learning rate inside an inject_hyperparams opt state
    (plateau mode). Returns the updated opt state pytree."""
    import jax.numpy as jnp

    def visit(node):
        if hasattr(node, "hyperparams") and "learning_rate" in node.hyperparams:
            hp = dict(node.hyperparams)
            hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
            return node._replace(hyperparams=hp)
        if isinstance(node, tuple):
            children = tuple(visit(c) for c in node)
            if hasattr(node, "_fields"):  # namedtuple
                return type(node)(*children)
            return children
        if isinstance(node, dict):
            # optax.multi_transform keeps per-label states in a dict
            # (inner_states) — recurse so plateau LR reaches the injected
            # hyperparams even when freeze_stages wraps the chain.
            return {k: visit(v) for k, v in node.items()}
        return node

    return visit(opt_state)


def get_learning_rate(opt_state):
    """Read the injected learning-rate leaf out of an inject_hyperparams opt
    state (plateau mode). Returns the raw leaf (scalar, or (K,) for the
    fold-parallel stacked state) or None when no injected LR exists."""
    found = []

    def visit(node):
        if hasattr(node, "hyperparams") and "learning_rate" in node.hyperparams:
            found.append(node.hyperparams["learning_rate"])
            return
        if isinstance(node, tuple):
            for c in node:
                visit(c)
        elif isinstance(node, dict):
            for c in node.values():
                visit(c)

    visit(opt_state)
    return found[0] if found else None


def _with_freeze(core: optax.GradientTransformation, cfg) -> optax.GradientTransformation:
    if cfg.freeze_stages > 0:
        label = _freeze_label_fn(cfg.freeze_stages)
        return optax.multi_transform(
            {"train": core, "frozen": optax.set_to_zero()},
            lambda params: jax.tree_util.tree_map_with_path(
                lambda path, leaf: label(path, leaf), params
            ),
        )
    return core
