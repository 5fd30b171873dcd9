"""LR schedules.

``warmup_cosine_schedule`` reproduces the reference's hand-rolled
LambdaLR (`train_advanced_v4.py:183-191`) exactly, including its quirk:
``min_lr`` (1e-6) acts as a floor on the *multiplier*, not the absolute LR
(so the effective floor is lr*min_lr). A second quirk is preserved upstream:
the reference sizes ``num_training_steps`` in microbatches but advances the
scheduler only once per optimizer step (`train_advanced_v4.py:628-634` vs
`:233-234`), so training ends mid-cosine — the trainer reproduces this when
``cfg.schedule_horizon == 'microbatches'``.

``PlateauScheduler`` is the host-side ReduceLROnPlateau of V1
(`previous/V1-effb0/train.py:203-206`): mode='max', factor, patience.
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp


def warmup_cosine_schedule(
    base_lr: float,
    num_warmup_steps: int,
    num_training_steps: int,
    min_lr_multiplier: float = 1e-6,
) -> Callable:
    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        warm = count / jnp.maximum(1.0, num_warmup_steps)
        progress = (count - num_warmup_steps) / jnp.maximum(
            1.0, num_training_steps - num_warmup_steps
        )
        cos = jnp.maximum(
            min_lr_multiplier, 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        )
        return base_lr * jnp.where(count < num_warmup_steps, warm, cos)

    return schedule


class PlateauScheduler:
    """Host-side ReduceLROnPlateau (mode='max')."""

    def __init__(
        self,
        base_lr: float,
        factor: float = 0.1,
        patience: int = 3,
        min_lr: float = 0.0,
    ):
        self.lr = base_lr
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.best = -math.inf
        self.bad_epochs = 0

    def step(self, metric: float) -> float:
        """Report a (higher-is-better) metric; returns the current LR."""
        if metric > self.best:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.lr = max(self.min_lr, self.lr * self.factor)
                self.bad_epochs = 0
        return self.lr

    def state_dict(self) -> dict:
        """JSON-serializable internals, persisted in the resume checkpoint."""
        best = None if self.best == -math.inf else self.best
        return {"lr": self.lr, "best": best, "bad_epochs": self.bad_epochs}

    def load_state_dict(self, d: dict) -> None:
        self.lr = float(d["lr"])
        best = d["best"]
        self.best = -math.inf if best is None else float(best)
        self.bad_epochs = int(d["bad_epochs"])
