"""Single-pass fused AdamW + EMA parameter update.

The generic optax path walks the ~340-leaf ConvNeXt-B parameter tree six
times per step (clip write-back, mu, nu, weight decay, apply_updates, EMA
shadow), each pass its own family of small HLO fusions re-reading the same
HBM. Profiling (docs/PERF_NOTES.md round 2) attributes ~8 ms/step to these
passes against a ~4 ms traffic roofline. This module computes the exact
same math — optax ``clip_by_global_norm`` + ``adamw`` + the reference's EMA
rule ``shadow = d*shadow + (1-d)*param`` (`train_advanced_v4.py:75-80`) —
in ONE ``jax.tree.map`` whose per-leaf body emits (param, mu, nu, ema)
together, so XLA sees a single fusion per leaf and each buffer is read and
written exactly once.

Semantics parity (formula-for-formula against the installed optax source):
- clip: ``u = select(gnorm < clip, g, g * clip / gnorm)``
- adam: ``mu = b1*mu + (1-b1)*g``; ``nu = b2*nu + (1-b2)*g*g``;
  ``u = (mu/(1-b1^c)) / (sqrt(nu/(1-b2^c)) + eps)`` with ``c = count+1``
- adamw: ``u += wd * p``; ``p' = p - lr(count) * u`` (schedule evaluated at
  the pre-increment count, exactly like ``optax.scale_by_schedule``)
- EMA per optimizer step, matching ``train_state.ema_update``.

The optimizer state pytree keeps optax's own structure (the
``ScaleByAdamState`` / ``ScaleByScheduleState`` nodes are located and
rebuilt in place), so checkpoints, resume, and the generic path remain
interchangeable with the fused one.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


class ScheduledTx(NamedTuple):
    """optax.GradientTransformation plus the LR schedule that built it.

    Duck-types as a GradientTransformation (``init``/``update``); the extra
    ``schedule`` field lets ``make_train_step`` reconstruct the learning
    rate inside the fused update without changing any call signature.
    """

    init: Callable
    update: Callable
    schedule: Callable | None


def can_fuse(cfg, tx) -> bool:
    """The fused path covers the default recipe: AdamW, a traced schedule,
    no per-subtree freezing (optax.multi_transform), no host-injected LR."""
    return (
        getattr(cfg, "fused_update", True)
        and getattr(tx, "schedule", None) is not None
        and cfg.optimizer.lower() == "adamw"
        and cfg.schedule != "plateau"
        and cfg.freeze_stages == 0
    )


def _find_adam_state(opt_state):
    """Locate the unique ScaleByAdamState node (fields count/mu/nu)."""
    found: list = []

    def visit(node):
        if hasattr(node, "_fields"):
            if {"count", "mu", "nu"} <= set(node._fields):
                found.append(node)
                return
            for c in node:
                visit(c)
        elif isinstance(node, (tuple, list)):
            for c in node:
                visit(c)

    visit(opt_state)
    if len(found) != 1:
        raise ValueError(
            f"expected exactly one ScaleByAdamState, found {len(found)}"
        )
    return found[0]


def _rebuild_opt_state(opt_state, count_inc, new_mu, new_nu):
    """Return opt_state with the adam node's count/mu/nu replaced and any
    ScaleByScheduleState counts advanced in lockstep."""

    def visit(node):
        if hasattr(node, "_fields"):
            if {"count", "mu", "nu"} <= set(node._fields):
                return node._replace(count=count_inc, mu=new_mu, nu=new_nu)
            if set(node._fields) == {"count"}:
                return node._replace(count=count_inc)
            return type(node)(*(visit(c) for c in node))
        if isinstance(node, tuple):
            return tuple(visit(c) for c in node)
        return node

    return visit(opt_state)


def fused_adamw_ema(
    grads: Any,
    opt_state: Any,
    params: Any,
    ema_params: Any,
    *,
    schedule: Callable,
    cfg,
) -> tuple[Any, Any, Any]:
    """One-pass clip + AdamW + EMA. Returns (params, opt_state, ema)."""
    b1, b2, eps = cfg.adam_b1, cfg.adam_b2, cfg.adam_eps
    wd = cfg.weight_decay
    ema_d = cfg.ema_decay

    adam = _find_adam_state(opt_state)
    count = adam.count
    count_inc = optax.safe_increment(count)
    lr = schedule(count)

    if cfg.gradient_clip_val > 0:
        clip = jnp.asarray(cfg.gradient_clip_val, jnp.float32)
        gnorm = optax.global_norm(grads)
        gscale = jnp.where(gnorm < clip, 1.0, clip / gnorm)
    else:
        gscale = jnp.ones((), jnp.float32)

    bc1 = 1.0 - jnp.power(b1, count_inc).astype(jnp.float32)
    bc2 = 1.0 - jnp.power(b2, count_inc).astype(jnp.float32)

    if ema_params is not None:

        def leaf(p, g, m, v, e):
            g = g * gscale.astype(g.dtype)
            m2 = b1 * m + (1.0 - b1) * g
            v2 = b2 * v + (1.0 - b2) * (g * g)
            u = (m2 / bc1) / (jnp.sqrt(v2 / bc2) + eps) + wd * p
            p2 = p - lr.astype(p.dtype) * u
            e2 = ema_d * e + (1.0 - ema_d) * p2
            return p2, m2, v2, e2

        out = jax.tree.map(leaf, params, grads, adam.mu, adam.nu, ema_params)
        outer = jax.tree.structure(params)
        inner = jax.tree.structure((0, 0, 0, 0))
        new_params, new_mu, new_nu, new_ema = jax.tree.transpose(
            outer, inner, out
        )
    else:

        def leaf(p, g, m, v):
            g = g * gscale.astype(g.dtype)
            m2 = b1 * m + (1.0 - b1) * g
            v2 = b2 * v + (1.0 - b2) * (g * g)
            u = (m2 / bc1) / (jnp.sqrt(v2 / bc2) + eps) + wd * p
            p2 = p - lr.astype(p.dtype) * u
            return p2, m2, v2

        out = jax.tree.map(leaf, params, grads, adam.mu, adam.nu)
        outer = jax.tree.structure(params)
        inner = jax.tree.structure((0, 0, 0))
        new_params, new_mu, new_nu = jax.tree.transpose(outer, inner, out)
        new_ema = None

    new_opt = _rebuild_opt_state(opt_state, count_inc, new_mu, new_nu)
    return new_params, new_opt, new_ema
