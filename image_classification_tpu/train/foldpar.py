"""Fold-parallel training: all K cross-validation folds in one SPMD program.

The reference trains folds sequentially on its single GPU
(`train_advanced_v4.py:562-655`); on a TPU slice the folds are embarrassingly
parallel — same model, same step program, different data and parameters. This
module stacks the K folds' TrainStates along a leading axis sharded over a
``fold`` mesh axis and ``jax.vmap``s the standard train/eval steps over it,
so a (fold=K, data=D, model=M) mesh trains all folds simultaneously: K folds
finish in the wall time of one. The north-star "2-fold ConvNeXt-Base in
<30 min" (BASELINE.md) runs both folds at once on a 2-slice mesh.

Semantics match the sequential path exactly: per-fold init keys, per-fold
step keys, and per-fold loader orders are the same ones ``train_k_fold`` +
``train_fold`` would use, so a fold's trajectory is identical (up to
reassociation) whether trained sequentially or fold-parallel
(tests/test_foldpar.py asserts this).

Resume is supported: the stacked TrainState checkpoints to ONE
``train_state_foldpar`` directory (all folds in one tree, epoch-aligned by
construction) on the ``save_state_every`` cadence, with the per-fold host
bookkeeping (best acc/loss, patience) in the metadata sidecar.

SWA is supported: ``swa_update`` vmaps over the stacked state, the BN
refresh (`previous/V3-efb2/train_advanced_v3.0.py:505-507`) runs stacked
over every fold's train loader, and the SWA candidate replaces a fold's
best checkpoint only where it validates better — same semantics as the
sequential path.

The plateau schedule (`previous/V1-effb0/train.py:203-206`) is supported:
K independent host-side ``PlateauScheduler``s step on each fold's own
metric, and the resulting per-fold LRs are injected as ONE (K,) vector into
the stacked ``inject_hyperparams`` leaf (vmap turns the scalar LR
hyperparameter into a per-fold array, so folds diverge freely). The
schedulers' internals ride the resume sidecar like the sequential path's.

Progressive resizing is supported: the stage size is a function of the
epoch only (identical across folds), so the stacked program recompiles per
stage exactly like the sequential per-size step cache.

Weighted-loss class weights are EXACT per fold: the
(K, num_classes) weight stack is a vmapped operand of the train step
(a closure can't vary across vmap).
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

from image_classification_tpu.core import prng
from image_classification_tpu.models.factory import create_model, load_pretrained_into
from image_classification_tpu.train.loop import (
    FoldResult,
    _append_metrics,
    build_lr_schedule,
    progressive_size,
)
from image_classification_tpu.train.loss import build_criterion
from image_classification_tpu.train.optim import (
    build_optimizer,
    get_learning_rate,
    set_learning_rate,
)
from image_classification_tpu.train.schedule import PlateauScheduler
from image_classification_tpu.train.step import (
    make_bn_update_step,
    make_eval_step,
    make_train_step,
)
from image_classification_tpu.train.train_state import create_train_state, swa_update
from image_classification_tpu.utils import checkpoint as ckpt
from image_classification_tpu.utils.metrics import macro_f1, per_class_f1
from image_classification_tpu.utils.profiler import StepTimer

logger = logging.getLogger("ic_tpu")


def _stack_batches(batches: list[dict], keys: tuple[str, ...]) -> dict:
    return {k: np.stack([b[k] for b in batches]) for k in keys}


def _zero_like_batch(batch: dict) -> dict:
    """An all-masked batch (images/labels zero, mask False) for folds whose
    val loader is exhausted — masked eval sums make it contribute nothing."""
    out = {k: np.zeros_like(v) for k, v in batch.items()}
    return out


def _stacked_validate(eval_step, state, val_loaders, b_shard):
    """Run the stacked eval step over every fold's val loader, iterating to
    the longest fold's batch count; exhausted folds contribute all-masked
    zero batches. Returns the summed metric tree as numpy (leading K dim)."""
    val_iters = [iter(v) for v in val_loaders]
    acc_sums = None
    exhausted_template: dict | None = None
    while True:
        cols = [next(it, None) for it in val_iters]
        if all(c is None for c in cols):
            break
        live = next(c for c in cols if c is not None)
        if exhausted_template is None:
            exhausted_template = _zero_like_batch(
                {k: live[k] for k in ("image", "label", "mask")}
            )
        cols = [
            {k: c[k] for k in ("image", "label", "mask")}
            if c is not None else exhausted_template
            for c in cols
        ]
        stacked = _stack_batches(cols, ("image", "label", "mask"))
        stacked = {k: jax.device_put(v, b_shard) for k, v in stacked.items()}
        m = eval_step(state, stacked)
        acc_sums = m if acc_sums is None else jax.tree.map(jnp.add, acc_sums, m)
    return jax.tree.map(np.asarray, acc_sums)


def init_fold_states(cfg, bundle, mesh, n_folds: int):
    """Stacked TrainState for all folds: per-fold init keys (matching
    ``train_fold``'s ``prng.fold(root, fold)``), pretrained backbone
    broadcast across folds when configured."""
    root = prng.root_key(cfg.seed)
    init_keys = jnp.stack(
        [prng.fold_name(prng.fold(root, k), "init") for k in range(1, n_folds + 1)]
    )
    stacked_vars = jax.jit(jax.vmap(bundle.init))(init_keys)

    if cfg.pretrained:
        # load once on host, broadcast the loaded leaves across the fold dim
        template = jax.tree.map(lambda a: np.asarray(a[0]), stacked_vars)
        loaded = load_pretrained_into(bundle, template, cfg)

        def merge(stacked, tmpl, new):
            if np.shares_memory(tmpl, new) or np.array_equal(tmpl, new):
                return stacked  # leaf untouched by the import: keep per-fold init
            return np.broadcast_to(new, stacked.shape).copy()

        stacked_vars = jax.tree.map(
            merge, jax.tree.map(np.asarray, stacked_vars), template, loaded
        )
    return stacked_vars


FOLDPAR_CKPT = "par"  # resume_path(output_dir, "par") -> train_state_foldpar


def train_k_fold_parallel(
    cfg,
    splits,
    make_loaders,
    mesh,
    model_name: str | None = None,
    resume: bool = False,
) -> list[FoldResult]:
    """Train every fold of ``splits`` simultaneously over ``mesh``'s fold
    axis.

    ``make_loaders(fold_idx, train_idx, val_idx) -> (train_loader,
    val_loader)`` must build HOST loaders (mesh=None) — batches are stacked
    across folds here and device_put with (fold, data) sharding.
    """
    from image_classification_tpu.parallel.mesh import FOLD_AXIS, fold_batch_sharding
    from image_classification_tpu.parallel.shardings import fold_state_shardings

    splits = list(splits)  # stratified_kfold yields lazily
    n_folds = len(splits)
    mesh_folds = mesh.shape.get(FOLD_AXIS, 1)
    if mesh_folds != n_folds:
        raise ValueError(
            f"mesh fold axis ({mesh_folds}) != number of folds ({n_folds})"
        )

    bundle = create_model(cfg, model_name)
    loaders = [
        make_loaders(fold, train_idx, val_idx)
        for fold, (train_idx, val_idx) in enumerate(splits, start=1)
    ]
    train_loaders = [t for t, _ in loaders]
    val_loaders = [v for _, v in loaders]
    steps_per_epoch = min(len(t) for t in train_loaders)

    schedule = build_lr_schedule(cfg, steps_per_epoch)
    tx = build_optimizer(cfg, schedule)
    plateaus = (
        [
            PlateauScheduler(cfg.lr, cfg.plateau_factor, cfg.plateau_patience)
            for _ in range(n_folds)
        ]
        if cfg.schedule == "plateau"
        else None
    )
    criterion = build_criterion(cfg, class_counts=None)
    fold_weights = None
    if cfg.use_weighted_loss:
        # EXACT per-fold class weights: the criterion closure can't vary
        # across vmap, so the (K, num_classes) weight stack rides the fold
        # axis as a vmapped operand instead (reference semantics:
        # `V3.1/train_advanced_v3.2.py:470-486` builds weights from each
        # split's own train counts).
        counts = np.stack([
            np.bincount(
                t.manifest.labels[t.indices], minlength=cfg.num_classes
            ).astype(np.float32)
            for t in train_loaders
        ])
        w = 1.0 / np.maximum(counts, 1.0)
        fold_weights = jnp.asarray(
            w / w.sum(axis=1, keepdims=True) * cfg.num_classes
        )

    stacked_vars = init_fold_states(cfg, bundle, mesh, n_folds)
    state = jax.vmap(
        lambda v: create_train_state(
            v, tx, use_ema=cfg.use_ema, use_swa=cfg.use_swa
        )
    )(jax.tree.map(jnp.asarray, stacked_vars))
    n_params = sum(x.size for x in jax.tree.leaves(state.params)) // n_folds
    logger.info(
        "fold-parallel: %d folds x %s (%.2fM params/fold) on mesh %s",
        n_folds, bundle.name, n_params / 1e6, dict(mesh.shape),
    )

    s_shard = fold_state_shardings(state, mesh)
    state = jax.device_put(state, s_shard)
    b_shard = fold_batch_sharding(mesh)

    if fold_weights is not None:
        fold_weights = jax.device_put(
            fold_weights, NamedSharding(mesh, P(FOLD_AXIS))
        )

    # Per-size step cache: progressive resizing changes the training input
    # size between stages (loop.py:progressive_size) — the size is a
    # function of the epoch only, so it is identical across folds and the
    # stacked program recompiles per stage exactly like the sequential one.
    step_cache: dict = {}

    def train_step_for(epoch: int):
        size = progressive_size(cfg, epoch)
        if size not in step_cache:
            stage_cfg = cfg.replace(image_size=size)
            if fold_weights is None:
                step_cache[size] = jax.jit(
                    jax.vmap(
                        make_train_step(
                            bundle, stage_cfg, tx, criterion, mesh=mesh
                        )
                    ),
                    donate_argnums=(0,),
                    out_shardings=(s_shard, None),
                )
            else:
                def _step_with_weights(fstate, batch, key, weights):
                    crit = build_criterion(cfg, class_weights=weights)
                    return make_train_step(
                        bundle, stage_cfg, tx, crit, mesh=mesh
                    )(
                        fstate, batch, key
                    )

                _jit_w = jax.jit(
                    jax.vmap(_step_with_weights),
                    donate_argnums=(0,),
                    out_shardings=(s_shard, None),
                )
                step_cache[size] = lambda s, b, k, _j=_jit_w: _j(
                    s, b, k, fold_weights
                )
        return step_cache[size]
    eval_step = jax.jit(jax.vmap(make_eval_step(bundle, cfg, use_ema=cfg.ema_eval)))
    swa_step = jax.jit(jax.vmap(swa_update), out_shardings=s_shard)

    root = prng.root_key(cfg.seed)
    step_keys = jnp.stack(
        [prng.fold_name(prng.fold(root, k), "steps") for k in range(1, n_folds + 1)]
    )

    best_val_acc = [-1.0] * n_folds
    best_val_loss = [float("inf")] * n_folds
    best_variables: list[dict] = [{} for _ in range(n_folds)]
    patience = [0] * n_folds
    histories: list[list[dict]] = [[] for _ in range(n_folds)]

    start_epoch = 0
    if resume:
        restored = ckpt.load_train_state(cfg.output_dir, FOLDPAR_CKPT, state)
        if restored is not None:
            host_state_np, start_epoch, resumed_host = restored
            state = jax.device_put(host_state_np, s_shard)
            best_val_acc = list(resumed_host.get("best_val_acc", best_val_acc))
            best_val_loss = [
                float(x) for x in resumed_host.get("best_val_loss", best_val_loss)
            ]
            patience = list(resumed_host.get("patience", patience))
            if plateaus is not None:
                if resumed_host.get("plateau"):
                    # scheduler internals; the injected (K,) LR leaf itself
                    # is already inside the restored opt_state
                    for p, d in zip(plateaus, resumed_host["plateau"]):
                        p.load_state_dict(d)
                else:
                    # Pre-plateau-sidecar checkpoint: seed the schedulers
                    # from the restored opt_state's injected LR so the first
                    # p.step() does not undo an already-applied reduction.
                    lr_leaf = get_learning_rate(state.opt_state)
                    if lr_leaf is not None:
                        lrs = np.asarray(lr_leaf).reshape(-1)
                        for k, p in enumerate(plateaus):
                            p.lr = float(lrs[k if lrs.size > 1 else 0])
                        logger.warning(
                            "fold-parallel resume: checkpoint has no plateau "
                            "sidecar; seeded scheduler LRs from opt_state %s",
                            [p.lr for p in plateaus],
                        )
            logger.info("fold-parallel: resumed at epoch %d", start_epoch)
            # reload on-disk best checkpoints so FoldResult carries them even
            # if no post-resume epoch improves
            for k in range(n_folds):
                if best_val_acc[k] <= -1.0:
                    continue
                template = {
                    "params": jax.tree.map(lambda a: np.asarray(a[k]), state.params)
                }
                if state.batch_stats is not None:
                    template["batch_stats"] = jax.tree.map(
                        lambda a: np.asarray(a[k]), state.batch_stats
                    )
                try:
                    best_variables[k], _ = ckpt.load_best(
                        cfg.model_save_path, k + 1, template
                    )
                except Exception:
                    logger.warning(
                        "fold %d: could not reload best checkpoint", k + 1
                    )

    writer = ckpt.AsyncCheckpointWriter()
    for epoch in range(start_epoch, cfg.epochs):
        for t in train_loaders:
            t.set_epoch(epoch)
        train_step = train_step_for(epoch)
        timer = StepTimer()
        losses, accs = [], []
        iters = [iter(t) for t in train_loaders]
        for _ in range(steps_per_epoch):
            with timer.data_wait():
                batches = [next(it) for it in iters]
                stacked = _stack_batches(batches, ("image", "label"))
                stacked = {
                    k: jax.device_put(v, b_shard) for k, v in stacked.items()
                }
            with timer.compute(n_images=n_folds * cfg.batch_size):
                state, metrics = train_step(state, stacked, step_keys)
            losses.append(metrics["loss"])
            accs.append(metrics["accuracy"])
        jax.block_until_ready(state.params)
        perf = timer.summary()
        train_loss = np.mean([np.asarray(l) for l in losses], axis=0)  # (K,)
        train_acc = np.mean([np.asarray(a) for a in accs], axis=0)

        # ---- stacked validation: iterate to the longest fold's batch count;
        # exhausted folds contribute all-masked zero batches.
        acc_sums = _stacked_validate(eval_step, state, val_loaders, b_shard)

        # SWA snapshot AFTER validation, like the sequential loop
        # (`train/loop.py`): the epoch's val metrics reflect pre-SWA weights.
        if cfg.use_swa and (epoch + 1) >= cfg.swa_start_epoch:
            state = swa_step(state)

        stop = True
        for k in range(n_folds):
            cm = acc_sums["confusion"][k]
            count = max(float(acc_sums["count"][k]), 1.0)
            f1 = np.asarray(per_class_f1(jnp.asarray(cm)))
            present = cm.sum(axis=1) > 0
            record = {
                "epoch": epoch,
                "train_loss": float(train_loss[k]),
                "train_acc": float(train_acc[k]),
                "val_loss": float(acc_sums["loss_sum"][k]) / count,
                "val_acc": float(acc_sums["correct"][k]) / count,
                "val_macro_f1": float(macro_f1(jnp.asarray(cm))),
                "val_min_class_f1": float(f1[present].min()) if present.any() else 0.0,
                **perf,
            }
            histories[k].append(record)
            _append_metrics(cfg.output_dir, k + 1, record)
            logger.info(
                "fold %d epoch %d/%d: train %.4f/%.4f val %.4f/%.4f f1 %.4f",
                k + 1, epoch + 1, cfg.epochs, record["train_loss"],
                record["train_acc"], record["val_loss"], record["val_acc"],
                record["val_macro_f1"],
            )
            improved_acc = record["val_acc"] > best_val_acc[k]
            improved_loss = (
                cfg.save_best_loss and record["val_loss"] < best_val_loss[k]
            )
            if improved_acc:
                best_val_acc[k] = record["val_acc"]
                patience[k] = 0
            else:
                patience[k] += 1
            if improved_loss:
                best_val_loss[k] = record["val_loss"]
            if improved_acc or improved_loss:
                # Pull ONLY the improved fold's slice. ``a[k]`` slices on
                # device into fresh buffers (safe from the train step's
                # donation), so the slow device->host pull can ride the
                # background writer. eval_params just selects the EMA tree;
                # stacked arrays pass through unchanged, so no vmap needed.
                ep = state.eval_params(use_ema=cfg.use_ema and cfg.ema_eval)
                snap = {"params": jax.tree.map(lambda a: a[k], ep)}
                if state.batch_stats is not None:
                    snap["batch_stats"] = jax.tree.map(
                        lambda a: a[k], state.batch_stats
                    )

                def _best_job(snap=snap, k=k, acc=record["val_acc"],
                              loss=record["val_loss"], ia=improved_acc,
                              il=improved_loss):
                    host = jax.tree.map(np.asarray, snap)
                    if ia:
                        ckpt.save_best(
                            cfg.model_save_path, k + 1, host["params"],
                            host.get("batch_stats"), acc, val_loss=loss,
                        )
                        best_variables[k] = host
                    if il:
                        ckpt.save_best(
                            cfg.model_save_path, k + 1, host["params"],
                            host.get("batch_stats"), acc, val_loss=loss,
                            metric="loss",
                        )

                if cfg.async_checkpoint:
                    writer.submit(_best_job)
                else:
                    _best_job()
            if patience[k] < cfg.patience:
                stop = False
        # plateau step BEFORE the epoch checkpoint (loop.py parity): each
        # fold's scheduler sees its own metric; the K new LRs are injected
        # as one (K,) vector into the stacked hyperparams leaf.
        if plateaus is not None:
            mkey = "train_acc" if cfg.plateau_metric == "train_acc" else "val_acc"
            new_lrs = np.asarray(
                [
                    p.step(histories[k][-1][mkey])
                    for k, p in enumerate(plateaus)
                ],
                np.float32,
            )
            state = state.replace(
                opt_state=set_learning_rate(state.opt_state, new_lrs)
            )
            # re-commit: the rewritten LR leaf is a fresh host array and must
            # rejoin the fold-sharded state (no-op for the untouched leaves)
            state = jax.device_put(state, s_shard)
        logger.info(
            "fold-parallel epoch %d: %.1f img/s (all folds), duty %.1f%%",
            epoch + 1, perf["images_per_sec"], 100 * perf["duty_cycle"],
        )
        # Stacked-state resume checkpoint, same cadence as train_fold
        if cfg.save_state_every > 0 and (
            (epoch + 1 - start_epoch) % cfg.save_state_every == 0
            or epoch == cfg.epochs - 1
            or stop
        ):
            host_meta = {
                "best_val_acc": best_val_acc,
                "best_val_loss": best_val_loss,
                "patience": patience,
                "plateau": (
                    [p.state_dict() for p in plateaus]
                    if plateaus is not None
                    else None
                ),
            }
            if cfg.async_checkpoint:
                writer.submit(
                    ckpt.save_train_state,
                    cfg.output_dir, FOLDPAR_CKPT,
                    ckpt.snapshot_device_tree(state), epoch, cfg,
                    host_state=host_meta,
                )
            else:
                ckpt.save_train_state(
                    cfg.output_dir, FOLDPAR_CKPT, state, epoch, cfg,
                    host_state=host_meta,
                )
        if stop:
            logger.info(
                "fold-parallel: all folds exceeded patience; stopping at "
                "epoch %d", epoch + 1,
            )
            break

    # all pending best-param pulls / state writes must land before results
    # (and before SWA may overwrite a fold's best checkpoint)
    writer.join()

    # ---- SWA finalization, stacked (`previous/V3-efb2/...:445-507` via the
    # sequential path in train/loop.py): average already lives in
    # state.swa_params; refresh BN stats over each fold's train data, validate
    # all folds at once, and keep the SWA weights per fold where they win.
    if cfg.use_swa and state.swa_params is not None:
        swa_counts = np.asarray(state.swa_count)
        if int(swa_counts.min()) > 0:
            swa_state = state.replace(params=state.swa_params, ema_params=None)
            if state.batch_stats is not None:
                bn_step = jax.jit(jax.vmap(make_bn_update_step(bundle, cfg)))
                bs = state.batch_stats
                for t in train_loaders:
                    t.set_epoch(0)
                bn_iters = [iter(t) for t in train_loaders]
                for _ in range(steps_per_epoch):
                    batches = [next(it) for it in bn_iters]
                    stacked = _stack_batches(batches, ("image", "label"))
                    stacked = {
                        k: jax.device_put(v, b_shard) for k, v in stacked.items()
                    }
                    bs = bn_step(swa_state.params, bs, stacked)
                swa_state = swa_state.replace(batch_stats=bs)
            sums = _stacked_validate(eval_step, swa_state, val_loaders, b_shard)
            for k in range(n_folds):
                count = max(float(sums["count"][k]), 1.0)
                swa_acc = float(sums["correct"][k]) / count
                logger.info(
                    "fold %d SWA (%d snapshots): val %.4f/%.4f",
                    k + 1, int(swa_counts[k]),
                    float(sums["loss_sum"][k]) / count, swa_acc,
                )
                swa_loss = float(sums["loss_sum"][k]) / count
                wins_acc = swa_acc > best_val_acc[k]
                wins_loss = cfg.save_best_loss and swa_loss < best_val_loss[k]
                if wins_acc or wins_loss:
                    snap = {
                        "params": jax.tree.map(
                            lambda a: np.asarray(a[k]), swa_state.params
                        )
                    }
                    if swa_state.batch_stats is not None:
                        snap["batch_stats"] = jax.tree.map(
                            lambda a: np.asarray(a[k]), swa_state.batch_stats
                        )
                if wins_acc:
                    best_val_acc[k] = swa_acc
                    best_variables[k] = snap
                    ckpt.save_best(
                        cfg.model_save_path, k + 1, snap["params"],
                        snap.get("batch_stats"), swa_acc, val_loss=swa_loss,
                    )
                if wins_loss:  # SWA competes in both tiers (loop.py parity)
                    best_val_loss[k] = swa_loss
                    ckpt.save_best(
                        cfg.model_save_path, k + 1, snap["params"],
                        snap.get("batch_stats"), swa_acc, val_loss=swa_loss,
                        metric="loss",
                    )

    results = []
    for k in range(n_folds):
        if not best_variables[k]:
            params = jax.tree.map(lambda a: np.asarray(a[k]), state.params)
            best_variables[k] = {"params": params}
            if state.batch_stats is not None:
                best_variables[k]["batch_stats"] = jax.tree.map(
                    lambda a: np.asarray(a[k]), state.batch_stats
                )
        results.append(
            FoldResult(
                fold=k + 1,
                best_val_acc=best_val_acc[k],
                best_variables=best_variables[k],
                bundle=bundle,
                history=histories[k],
            )
        )
    return results
