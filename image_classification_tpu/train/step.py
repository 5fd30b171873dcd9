"""The jitted train / eval steps — the framework's hot loop.

One XLA program per optimizer step replaces the reference's whole per-batch
Python path (`train_advanced_v4.py:193-281`): device-side augmentation,
in-batch MixUp/CutMix, ``gradient_accumulation_steps`` microbatches via
``lax.scan``, global-norm clip + AdamW + schedule, and the EMA update —
with donated buffers, bf16 compute, f32 params, and the data-parallel
gradient all-reduce inserted automatically by XLA from the mesh shardings.

Parity notes:
- The reference's AMP path *sums* microbatch losses' gradients without
  dividing by the accumulation count (asymmetry vs its non-AMP path,
  `train_advanced_v4.py:223-244`); ``cfg.grad_accum_reduction`` selects
  'sum' (parity, AMP was on in published runs) or 'mean'.
- EMA updates once per optimizer step (`train_advanced_v4.py:236-237`).
- Train accuracy is measured against the pre-mix integer labels (the
  reference only measured it on unmixed batches, `:259-265`; with per-sample
  in-batch mixing that set is empty, so this is the closest observable).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from image_classification_tpu.aug.mix import MixCfg, mixup_cutmix_batch
from image_classification_tpu.aug.pipeline import (
    aug_configs_from,
    eval_preprocess,
    train_augment,
)
from image_classification_tpu.core import prng
from image_classification_tpu.train.fused import can_fuse, fused_adamw_ema
from image_classification_tpu.train.loss import smoothed_cross_entropy
from image_classification_tpu.train.train_state import (
    TrainState,
    ema_update,
)


def make_train_step(
    bundle,
    cfg,
    tx: optax.GradientTransformation,
    criterion: Callable,
    mesh=None,
) -> Callable:
    """Build ``train_step(state, batch, base_key) -> (state, metrics)``.

    ``batch`` is a dict with 'image' uint8 (B, h, w, 3) and 'label' int32
    (B,), already device-put with the batch dim sharded over the mesh.
    ``mesh``: the concrete training Mesh when known — on data-parallel-only
    meshes the Pallas warp stays enabled via shard_map (aug/pipeline.py).
    """
    aug = aug_configs_from(cfg, mesh=mesh)
    mix_cfg = MixCfg(
        mixup_alpha=cfg.mixup_alpha,
        cutmix_alpha=cfg.cutmix_alpha,
        prob=cfg.mix_prob,
        num_classes=cfg.num_classes,
    )
    accum = cfg.gradient_accumulation_steps
    use_mix = cfg.mixup_alpha > 0 or cfg.cutmix_alpha > 0
    has_bs = bundle.has_batch_stats
    # single-pass clip+AdamW+EMA on the default recipe (train/fused.py)
    fused = can_fuse(cfg, tx)

    def loss_for_microbatch(params, batch_stats, images, targets, drop_key):
        variables = {"params": params}
        if has_bs:
            variables["batch_stats"] = batch_stats
            outputs, updates = bundle.module.apply(
                variables, images, deterministic=False,
                rngs={"dropout": drop_key}, mutable=["batch_stats"],
            )
            new_bs = updates["batch_stats"]
        else:
            outputs = bundle.module.apply(
                variables, images, deterministic=False,
                rngs={"dropout": drop_key},
            )
            new_bs = batch_stats
        loss = criterion(outputs, targets)
        main = outputs[0] if isinstance(outputs, (tuple, list)) else outputs
        return loss, (new_bs, main)

    grad_fn = jax.value_and_grad(loss_for_microbatch, has_aux=True)

    def train_step(state: TrainState, batch: dict, base_key: jax.Array):
        key = prng.fold(base_key, state.step)
        labels = batch["label"]
        if not cfg.aug_enabled:
            # pre-augmented float inputs (ablations / trajectory parity)
            images, targets = batch["image"], labels
        else:
            images = train_augment(
                batch["image"], prng.fold_name(key, "aug"), aug
            )
            if use_mix:
                images, targets = mixup_cutmix_batch(
                    images, labels, prng.fold_name(key, "mix"), mix_cfg
                )
            else:
                targets = labels
        B = images.shape[0]
        micro = B // accum
        # (B, ...) -> (accum, micro, ...) keeping the sharded batch dim local:
        # consecutive rows stay on-device, so this is a free reshape+transpose.
        mb_images = jnp.swapaxes(
            images.reshape(micro, accum, *images.shape[1:]), 0, 1
        )
        mb_targets = jnp.swapaxes(
            targets.reshape(micro, accum, *targets.shape[1:]), 0, 1
        )

        def micro_step(carry, xs):
            grads_acc, bs, i = carry
            imgs, tgts = xs
            dkey = prng.fold(prng.fold_name(key, "dropout"), i)
            (loss, (new_bs, main)), grads = grad_fn(
                state.params, bs, imgs, tgts, dkey
            )
            grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
            return (grads_acc, new_bs, i + 1), (loss, main)

        zero_grads = jax.tree.map(jnp.zeros_like, state.params)
        (grads, new_bs, _), (losses, mains) = jax.lax.scan(
            micro_step,
            (zero_grads, state.batch_stats, jnp.zeros((), jnp.int32)),
            (mb_images, mb_targets),
        )
        if cfg.grad_accum_reduction == "mean":
            grads = jax.tree.map(lambda g: g / accum, grads)
        if fused:
            new_params, new_opt, new_ema = fused_adamw_ema(
                grads, state.opt_state, state.params, state.ema_params,
                schedule=tx.schedule, cfg=cfg,
            )
        else:
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_ema = (
                ema_update(state.ema_params, new_params, cfg.ema_decay)
                if state.ema_params is not None
                else None
            )
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt,
            ema_params=new_ema,
            batch_stats=new_bs,
        )
        # mains is (accum, micro, C); sample (m, a) was original row m*accum+a
        mains_flat = jnp.swapaxes(mains, 0, 1).reshape(B, -1)
        preds = jnp.argmax(mains_flat, axis=-1)
        metrics = {
            "loss": jnp.mean(losses),
            "accuracy": jnp.mean(preds == labels.reshape(-1)),
        }
        return new_state, metrics

    return train_step


def make_eval_step(bundle, cfg, use_ema: bool = True) -> Callable:
    """Build ``eval_step(state, batch) -> metrics`` (masked sums, so padded
    final batches contribute nothing). Mirrors `validate`
    (`train_advanced_v4.py:283-315`): deep-supervised models are scored on
    the main head; loss is label-smoothed CE."""

    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    def eval_step(state: TrainState, batch: dict):
        params = state.eval_params(use_ema=use_ema and cfg.use_ema)
        images = eval_preprocess(
            batch["image"], tuple(cfg.image_size), tuple(cfg.mean),
            tuple(cfg.std), dtype=dtype, round_uint8=cfg.eval_resize_uint8,
        )
        variables = {"params": params}
        if bundle.has_batch_stats:
            variables["batch_stats"] = state.batch_stats
        outputs = bundle.module.apply(variables, images, deterministic=True)
        logits = outputs[0] if isinstance(outputs, (tuple, list)) else outputs
        labels = batch["label"]
        mask = batch["mask"].astype(jnp.float32)
        per = smoothed_cross_entropy(
            logits, labels, cfg.label_smoothing, reduction="none"
        )
        preds = jnp.argmax(logits, axis=-1)
        idx = labels * cfg.num_classes + preds
        cm = jnp.zeros((cfg.num_classes * cfg.num_classes,), jnp.float32)
        cm = cm.at[idx].add(mask)
        return {
            "loss_sum": jnp.sum(per * mask),
            "correct": jnp.sum((preds == labels) * mask),
            "count": jnp.sum(mask),
            "confusion": cm.reshape(cfg.num_classes, cfg.num_classes),
        }

    return eval_step


def make_bn_update_step(bundle, cfg) -> Callable:
    """One forward pass in train mode to refresh BatchNorm running stats —
    torch's ``update_bn`` used before SWA inference
    (`previous/V3-efb2/train_advanced_v3.0.py:505-507`). No-op for BN-free
    models (the trainer skips calling it)."""

    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    def bn_step(params, batch_stats, batch):
        images = eval_preprocess(
            batch["image"], tuple(cfg.image_size), tuple(cfg.mean),
            tuple(cfg.std), dtype=dtype, round_uint8=cfg.eval_resize_uint8,
        )
        _, updates = bundle.module.apply(
            {"params": params, "batch_stats": batch_stats},
            images,
            deterministic=False,
            rngs={"dropout": jax.random.key(0)},
            mutable=["batch_stats"],
        )
        return updates["batch_stats"]

    return bn_step


def make_eval_views(cfg, tta: Callable | None = None) -> Callable:
    """Build ``views(images_u8) -> (V*B, H, W, C)``: eval preprocessing plus
    the TTA views stacked along the batch dim (V=1 without TTA). Shared
    across ensemble members — every fold-model consumes the same tensor, so
    the preprocess + view construction runs once per batch, and each model
    runs ONE forward over all views (V x the matmul batch instead of V
    sequential dispatches — `train_advanced_v4.py:317-347` semantics at a
    fraction of the cost)."""
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    def views(images_u8: jnp.ndarray) -> jnp.ndarray:
        x = eval_preprocess(
            images_u8, tuple(cfg.image_size), tuple(cfg.mean),
            tuple(cfg.std), dtype=dtype, round_uint8=cfg.eval_resize_uint8,
        )
        if tta is None:
            return x
        return jnp.concatenate(tta(x), axis=0)

    return views


def make_forward_views(bundle, cfg, n_views: int = 1) -> Callable:
    """Build ``forward(variables, x_views) -> probs (B, C)``: one forward
    over the stacked (V*B) views, softmax in f32, mean over views
    (`train_advanced_v4.py:341-347`)."""

    def forward(variables: dict, x_views: jnp.ndarray) -> jnp.ndarray:
        outputs = bundle.module.apply(variables, x_views, deterministic=True)
        logits = outputs[0] if isinstance(outputs, (tuple, list)) else outputs
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        if n_views == 1:
            return probs
        return jnp.mean(probs.reshape(n_views, -1, probs.shape[-1]), axis=0)

    return forward


def tta_num_views(cfg, tta: Callable | None) -> int:
    """Number of views a TTA callable produces (probed on a dummy batch)."""
    if tta is None:
        return 1
    dummy = jnp.zeros((1, *cfg.image_size, 3), jnp.float32)
    return len(tta(dummy))


def make_predict_step(bundle, cfg, tta: Callable | None = None) -> Callable:
    """Build ``predict_step(variables, images_u8) -> probs`` for single-model
    inference. With ``tta`` set, averages softmax over the TTA views
    (`train_advanced_v4.py:317-347`), batched as one forward."""
    n_views = tta_num_views(cfg, tta)
    views = make_eval_views(cfg, tta)
    forward = make_forward_views(bundle, cfg, n_views)

    def predict_step(variables: dict, images_u8: jnp.ndarray) -> jnp.ndarray:
        return forward(variables, views(images_u8))

    return predict_step
