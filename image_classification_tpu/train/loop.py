"""The host-side epoch loop for one fold.

Thin orchestration around the compiled steps: epoch iteration, EMA-weights
validation, best tracking, patience early stop, SWA, checkpointing, and
throughput/duty-cycle accounting. Mirrors `train_fold`
(`train_advanced_v4.py:422-482`) plus V3's SWA
(`previous/V3-efb2/train_advanced_v3.0.py:445,463,505-507`) and real resume
(the capability `V3.1/utils.py:63-93` only sketched).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Any

import jax
import numpy as np

from image_classification_tpu.core import prng
from image_classification_tpu.models.factory import create_model, load_pretrained_into
from image_classification_tpu.train.loss import build_criterion
from image_classification_tpu.train.optim import build_optimizer
from image_classification_tpu.train.schedule import (
    PlateauScheduler,
    warmup_cosine_schedule,
)
from image_classification_tpu.train.step import make_eval_step, make_train_step
from image_classification_tpu.train.train_state import (
    TrainState,
    create_train_state,
    swa_update,
)
from image_classification_tpu.utils import checkpoint as ckpt
from image_classification_tpu.utils.lr_monitor import LRMonitor
from image_classification_tpu.utils.metrics import macro_f1, per_class_f1
from image_classification_tpu.utils.profiler import StepTimer

logger = logging.getLogger("ic_tpu")


# Config fields that do NOT influence any compiled program (paths, host
# bookkeeping, init-time weight loading, host-side sampling). Everything
# else is conservatively part of the program signature: compiled train/eval
# steps are reused across train_fold calls — across folds AND across
# in-process ladder stages (tools/run_hard_ladder.py) — only when every
# program-relevant field matches, so e.g. a mixup-off ablation can never
# silently reuse a mixup-on step. Remote XLA compiles cost minutes each
# (docs/PERF_NOTES.md), which is what this sharing buys back.
_HOST_ONLY_FIELDS = frozenset({
    "train_dir", "test_dir", "train_csv", "test_csv", "submission_path",
    "cache_dir", "use_decode_cache", "model_save_path", "output_dir",
    "profile_dir", "log_interval", "save_state_every", "async_checkpoint",
    "patience", "save_best_loss", "num_folds", "split_mode", "val_fraction",
    # NOT fold_parallel: it selects the downsample lowering (models/factory),
    # so stacked and sequential programs differ.
    "fold_seed", "prefetch_depth", "hbm_cache",
    "hbm_cache_limit_mb", "pretrained", "pretrained_path",
    "pretrained_strip_head", "seed",
    "use_sampler", "oversample_min_samples",
})


def program_sig(cfg) -> tuple:
    """Hashable signature of every program-relevant config field."""
    return tuple(
        (k, str(v))
        for k, v in sorted(cfg.to_dict().items())
        if k not in _HOST_ONLY_FIELDS
    )


@dataclass
class FoldResult:
    fold: int
    best_val_acc: float
    best_variables: dict            # {'params', maybe 'batch_stats'}
    bundle: Any
    history: list[dict] = field(default_factory=list)


def _append_metrics(output_dir: str, fold: int, record: dict) -> None:
    """Per-epoch metrics JSONL (machine-readable observability; the
    reference only had free-text logs)."""
    import json
    import os

    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, "metrics.jsonl"), "a") as f:
        f.write(json.dumps({"fold": fold, **record}) + "\n")


def build_lr_schedule(cfg, steps_per_epoch: int):
    """Cosine horizon sizing.

    The schedule count advances once per *optimizer* step (one ``tx.update``
    per loader batch; microbatching is internal to the jitted step), and
    training runs ``steps_per_epoch * epochs`` optimizer steps total.

    - ``schedule_horizon='microbatches'`` (default, parity mode) reproduces
      the reference quirk (`train_advanced_v4.py:628-634` vs `:233-234`):
      the horizon is sized in microbatch units
      (``steps_per_epoch * epochs * accum``) while the count advances in
      optimizer steps, so training ends mid-cosine at progress ``1/accum``.
    - ``schedule_horizon='steps'`` sizes the horizon in optimizer steps, so
      the cosine completes exactly at the end of training.
    """
    if cfg.schedule == "none":
        return cfg.lr
    if cfg.schedule == "plateau":
        return cfg.lr  # host-adjusted via PlateauScheduler + optimizer rebuild
    if cfg.schedule_horizon == "microbatches":
        total = steps_per_epoch * cfg.epochs * cfg.gradient_accumulation_steps
    else:
        total = steps_per_epoch * cfg.epochs
    warmup = int(total * cfg.warmup_ratio)
    return warmup_cosine_schedule(cfg.lr, warmup, total, cfg.min_lr)


def progressive_size(cfg, epoch: int) -> tuple[int, int]:
    """Training input size for ``epoch`` under progressive resizing
    (`config.py:12` flag): earlier epochs train at smaller (even-rounded)
    fractions of ``image_size``; the final stage is always the full size."""
    if not cfg.progressive_resizing:
        return tuple(cfg.image_size)
    scales = cfg.progressive_scales
    idx = min(len(scales) - 1, epoch * len(scales) // max(1, cfg.epochs))
    h = int(round(cfg.image_size[0] * scales[idx] / 2)) * 2
    w = int(round(cfg.image_size[1] * scales[idx] / 2)) * 2
    return (h, w)


def evaluate(eval_step, state: TrainState, loader) -> dict:
    # accumulate on device; one host fetch at the end (per-batch float()
    # would force a sync per batch and serialize the eval stream)
    acc = None
    for batch in loader:
        m = eval_step(state, batch)
        acc = m if acc is None else jax.tree.map(jnp_add, acc, m)
    if acc is None:
        return {"loss": 0.0, "accuracy": 0.0, "macro_f1": 0.0,
                "min_class_f1": 0.0, "confusion": None}
    cm = np.asarray(acc["confusion"])
    count = max(float(acc["count"]), 1.0)
    f1 = np.asarray(per_class_f1(cm))
    support = cm.sum(axis=1)
    present = support > 0
    return {
        "loss": float(acc["loss_sum"]) / count,
        "accuracy": float(acc["correct"]) / count,
        "macro_f1": float(macro_f1(cm)),
        # the reference's headline imbalance metric (progress.md:391-393)
        "min_class_f1": float(f1[present].min()) if present.any() else 0.0,
        "confusion": cm,
    }


def jnp_add(a, b):
    return a + b


def train_fold(
    cfg,
    train_loader,
    val_loader,
    fold: int = 1,
    class_counts: np.ndarray | None = None,
    resume: bool = False,
    model_name: str | None = None,
    shared: dict | None = None,
    mesh=None,
) -> FoldResult:
    """``shared``: an optional dict persisted across folds by the K-fold
    orchestrator; compiled train/eval steps (and the model bundle) are reused
    between folds — XLA compiles of the full step cost minutes, and every
    fold's model is identical by construction (only the params differ).
    ``mesh``: the training Mesh when multi-device (lets dp-only runs keep
    the Pallas block tail via shard_map — models/factory.create_model)."""
    shared = shared if shared is not None else {}
    steps_per_epoch = len(train_loader)
    counts_matter = cfg.use_weighted_loss or cfg.use_focal_loss
    sig = (
        model_name,
        steps_per_epoch,
        tuple(class_counts) if (counts_matter and class_counts is not None) else None,
        program_sig(cfg),
        None if mesh is None else tuple(dict(mesh.shape).items()),
    )
    if shared.get("sig") != sig:
        shared.clear()
        shared["sig"] = sig
        shared["bundle"] = create_model(cfg, model_name, mesh=mesh)
        shared["tx"] = build_optimizer(cfg, build_lr_schedule(cfg, steps_per_epoch))
        shared["criterion"] = build_criterion(
            cfg,
            class_counts=None
            if class_counts is None
            else jax.numpy.asarray(class_counts),
        )
        shared["step_cache"] = {}
        shared["eval_step"] = None
    bundle = shared["bundle"]
    tx = shared["tx"]
    criterion = shared["criterion"]
    root = prng.root_key(cfg.seed)
    fold_key = prng.fold(root, fold)

    variables = bundle.init(prng.fold_name(fold_key, "init"))
    variables = load_pretrained_into(bundle, variables, cfg)
    n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
    logger.info("fold %d: %s with %.2fM parameters", fold, bundle.name,
                n_params / 1e6)

    plateau = (
        PlateauScheduler(cfg.lr, cfg.plateau_factor, cfg.plateau_patience)
        if cfg.schedule == "plateau"
        else None
    )
    state = create_train_state(
        variables, tx, use_ema=cfg.use_ema, use_swa=cfg.use_swa
    )

    start_epoch = 0
    resumed_host: dict = {}
    if resume:
        restored = ckpt.load_train_state(cfg.output_dir, fold, state)
        if restored is not None:
            state, start_epoch, resumed_host = restored
            logger.info("fold %d: resumed at epoch %d", fold, start_epoch)

    # Progressive resizing (`config.py:12` flag): earlier epochs train at
    # smaller inputs; each distinct size is its own compiled step. The cache
    # lives in ``shared`` so later folds reuse compiled executables.
    step_cache: dict[tuple[int, int], Any] = shared["step_cache"]

    def train_step_for(epoch: int):
        size = progressive_size(cfg, epoch)
        if size not in step_cache:
            stage_cfg = cfg.replace(image_size=size)
            step_cache[size] = jax.jit(
                make_train_step(bundle, stage_cfg, tx, criterion, mesh=mesh),
                donate_argnums=(0,),
            )
        return step_cache[size]

    if shared.get("eval_step") is None:
        shared["eval_step"] = jax.jit(
            make_eval_step(bundle, cfg, use_ema=cfg.ema_eval)
        )
    eval_step = shared["eval_step"]

    # Host-side fold bookkeeping — restored on resume so a resumed fold is
    # the exact continuation (no re-saving a worse "best", no patience reset).
    best_val_acc = float(resumed_host.get("best_val_acc", -1.0))
    best_val_loss = float(resumed_host.get("best_val_loss", float("inf")))
    best_variables: dict = {}
    patience_counter = int(resumed_host.get("patience_counter", 0))
    if plateau is not None and resumed_host.get("plateau"):
        plateau.load_state_dict(resumed_host["plateau"])
    if best_val_acc > -1.0:
        # reload the on-disk best so FoldResult carries it even if no
        # post-resume epoch improves on it
        template = {"params": jax.tree.map(np.asarray, state.params)}
        if state.batch_stats is not None:
            template["batch_stats"] = jax.tree.map(np.asarray, state.batch_stats)
        try:
            best_variables, _ = ckpt.load_best(cfg.model_save_path, fold, template)
        except Exception:
            logger.warning("fold %d: could not reload best checkpoint", fold)
    history: list[dict] = []
    step_key = prng.fold_name(fold_key, "steps")
    lr_schedule = build_lr_schedule(cfg, steps_per_epoch)
    lr_monitor = LRMonitor()
    # Background checkpoint writer: device snapshots are handed to a thread
    # that does the (slow) device->host pull + disk write while the next
    # epoch trains. best_box carries the pulled best-model host tree.
    writer = ckpt.AsyncCheckpointWriter()
    best_box: dict = {}

    profiled = False
    for epoch in range(start_epoch, cfg.epochs):
        train_loader.set_epoch(epoch)
        train_step = train_step_for(epoch)
        timer = StepTimer()
        losses = []
        accs = []
        it = iter(train_loader)
        # optional jax.profiler trace of this fold's steady-state steps
        if cfg.profile_dir and epoch == start_epoch + 1 and not profiled:
            profiled = True
            jax.profiler.start_trace(cfg.profile_dir)
        step_i = 0
        while True:
            with timer.data_wait():
                batch = next(it, None)
            if batch is None:
                break
            with timer.compute(n_images=batch["image"].shape[0]):
                state, metrics = train_step(state, batch, step_key)
            losses.append(metrics["loss"])
            accs.append(metrics["accuracy"])
            step_i += 1
            # In-epoch progress logging (`V3.1/train_advanced_v3.2.py:182-187`;
            # tqdm postfix `train_advanced_v4.py:271-275`). The device
            # readback happens only at log points, so steps in between stay
            # fully async.
            if cfg.log_interval > 0 and step_i % cfg.log_interval == 0:
                lr_now = (
                    plateau.lr if plateau is not None
                    else (float(lr_schedule(int(state.step)))
                          if callable(lr_schedule) else float(lr_schedule))
                )
                logger.info(
                    "fold %d epoch %d step %d/%d: loss %.4f acc %.4f "
                    "lr %.2e (%.1f img/s)",
                    fold, epoch + 1, step_i, steps_per_epoch,
                    float(metrics["loss"]), float(metrics["accuracy"]),
                    lr_now, timer.images_per_sec,
                )
        # block on the last step so timing is honest
        jax.block_until_ready(state.params)
        if profiled and cfg.profile_dir and epoch == start_epoch + 1:
            jax.profiler.stop_trace()
        perf = timer.summary()  # train-only window (before validation)
        train_loss = float(np.mean([float(l) for l in losses])) if losses else 0.0
        train_acc = float(np.mean([float(a) for a in accs])) if accs else 0.0

        val = evaluate(eval_step, state, val_loader)
        record = {
            "epoch": epoch,
            "train_loss": train_loss,
            "train_acc": train_acc,
            "val_loss": val["loss"],
            "val_acc": val["accuracy"],
            "val_macro_f1": val["macro_f1"],
            "val_min_class_f1": val["min_class_f1"],
            **perf,
        }
        history.append(record)
        _append_metrics(cfg.output_dir, fold, record)
        logger.info(
            "fold %d epoch %d/%d: train %.4f/%.4f val %.4f/%.4f f1 %.4f "
            "(%.1f img/s, duty %.1f%%)",
            fold, epoch + 1, cfg.epochs, train_loss, train_acc,
            val["loss"], val["accuracy"], val["macro_f1"],
            perf["images_per_sec"], 100 * perf["duty_cycle"],
        )

        if cfg.use_swa and (epoch + 1) >= cfg.swa_start_epoch:
            state = swa_update(state)

        improved_acc = val["accuracy"] > best_val_acc
        improved_loss = cfg.save_best_loss and val["loss"] < best_val_loss
        if improved_acc:
            best_val_acc = val["accuracy"]
            patience_counter = 0
        else:
            patience_counter += 1
        if improved_loss:
            best_val_loss = val["loss"]
        if improved_acc or improved_loss:
            # One device snapshot serves both tiers (they are the same
            # weights this epoch); the slow device->host pull happens once.
            if cfg.async_checkpoint:
                snap_p = ckpt.snapshot_device_tree(
                    state.eval_params(use_ema=cfg.use_ema and cfg.ema_eval)
                )
                snap_bs = (
                    ckpt.snapshot_device_tree(state.batch_stats)
                    if state.batch_stats is not None
                    else None
                )

                def _best_job(p=snap_p, bs=snap_bs, acc=val["accuracy"],
                              loss=val["loss"], ia=improved_acc,
                              il=improved_loss):
                    host = {"params": jax.tree.map(np.asarray, p)}
                    if bs is not None:
                        host["batch_stats"] = jax.tree.map(np.asarray, bs)
                    if ia:
                        ckpt.save_best(
                            cfg.model_save_path, fold, host["params"],
                            host.get("batch_stats"), acc, val_loss=loss,
                        )
                        best_box["variables"] = host
                    if il:
                        ckpt.save_best(
                            cfg.model_save_path, fold, host["params"],
                            host.get("batch_stats"), acc, val_loss=loss,
                            metric="loss",
                        )

                writer.submit(_best_job)
            else:
                eval_params = state.eval_params(
                    use_ema=cfg.use_ema and cfg.ema_eval
                )
                host = {"params": jax.tree.map(np.asarray, eval_params)}
                if state.batch_stats is not None:
                    host["batch_stats"] = jax.tree.map(
                        np.asarray, state.batch_stats
                    )
                if improved_acc:
                    best_variables = host
                    ckpt.save_best(
                        cfg.model_save_path, fold, host["params"],
                        host.get("batch_stats"), val["accuracy"],
                        val_loss=val["loss"],
                    )
                if improved_loss:
                    ckpt.save_best(
                        cfg.model_save_path, fold, host["params"],
                        host.get("batch_stats"), val["accuracy"],
                        val_loss=val["loss"], metric="loss",
                    )

        # plateau step BEFORE the epoch checkpoint so the injected LR and the
        # scheduler internals are part of the resumable state
        if plateau is not None:
            from image_classification_tpu.train.optim import set_learning_rate

            metric = train_acc if cfg.plateau_metric == "train_acc" else val["accuracy"]
            new_lr = plateau.step(metric)
            state = state.replace(
                opt_state=set_learning_rate(state.opt_state, new_lr)
            )

        # LR curve recorder (`V3.1/train_advanced_v3.2.py:98-123`)
        current_lr = (
            plateau.lr
            if plateau is not None
            else (float(lr_schedule(int(state.step))) if callable(lr_schedule)
                  else float(lr_schedule))
        )
        lr_monitor.record(int(state.step), current_lr)

        stopping = patience_counter >= cfg.patience
        if cfg.save_state_every > 0 and (
            (epoch + 1 - start_epoch) % cfg.save_state_every == 0
            or epoch == cfg.epochs - 1
            or stopping
        ):
            host_state = {
                "best_val_acc": best_val_acc,
                "best_val_loss": best_val_loss,
                "patience_counter": patience_counter,
                "plateau": plateau.state_dict() if plateau is not None else None,
            }
            if cfg.async_checkpoint:
                writer.submit(
                    ckpt.save_train_state,
                    cfg.output_dir, fold, ckpt.snapshot_device_tree(state),
                    epoch, cfg, host_state=host_state,
                )
            else:
                ckpt.save_train_state(
                    cfg.output_dir, fold, state, epoch, cfg,
                    host_state=host_state,
                )

        if stopping:
            logger.info("fold %d: early stopping after epoch %d", fold, epoch + 1)
            break

    # All pending checkpoint pulls/writes must land before the fold result
    # is assembled (and before SWA may overwrite the best checkpoint).
    writer.join()
    if "variables" in best_box:
        best_variables = best_box["variables"]

    # ---- SWA finalization (`previous/V3-efb2/...:445-507`): average the
    # post-swa_start snapshots, refresh BN stats, keep it if it validates
    # better than the best EMA model.
    if cfg.use_swa and state.swa_params is not None and int(state.swa_count) > 0:
        from image_classification_tpu.train.step import make_bn_update_step

        swa_state = state.replace(params=state.swa_params, ema_params=None)
        if state.batch_stats is not None:
            bn_step = jax.jit(make_bn_update_step(bundle, cfg))
            bs = state.batch_stats
            train_loader.set_epoch(0)
            for batch in train_loader:
                bs = bn_step(swa_state.params, bs, batch)
            swa_state = swa_state.replace(batch_stats=bs)
        swa_val = evaluate(eval_step, swa_state, val_loader)
        logger.info(
            "fold %d SWA (%d snapshots): val %.4f/%.4f",
            fold, int(state.swa_count), swa_val["loss"], swa_val["accuracy"],
        )
        swa_wins_acc = swa_val["accuracy"] > best_val_acc
        swa_wins_loss = cfg.save_best_loss and swa_val["loss"] < best_val_loss
        if swa_wins_acc or swa_wins_loss:
            swa_host = {"params": jax.tree.map(np.asarray, swa_state.params)}
            if swa_state.batch_stats is not None:
                swa_host["batch_stats"] = jax.tree.map(
                    np.asarray, swa_state.batch_stats
                )
        if swa_wins_acc:
            best_val_acc = swa_val["accuracy"]
            best_variables = swa_host
            ckpt.save_best(
                cfg.model_save_path, fold, swa_host["params"],
                swa_host.get("batch_stats"), best_val_acc,
                val_loss=swa_val["loss"],
            )
        if swa_wins_loss:
            # keep the loss tier consistent with the acc tier: SWA competes
            # in both (example.py:380-390 saved best-score AND best-loss)
            best_val_loss = swa_val["loss"]
            ckpt.save_best(
                cfg.model_save_path, fold, swa_host["params"],
                swa_host.get("batch_stats"), swa_val["accuracy"],
                val_loss=swa_val["loss"], metric="loss",
            )

    if lr_monitor.lrs:
        import os

        try:
            lr_monitor.plot(os.path.join(cfg.output_dir, f"lr_curve_fold{fold}.png"))
        except Exception as e:  # plotting must never kill a training run
            logger.debug("fold %d: LR plot skipped (%s)", fold, e)

    if not best_variables:  # zero epochs or all NaN: fall back to final
        best_variables = {"params": jax.tree.map(np.asarray, state.params)}
        if state.batch_stats is not None:
            best_variables["batch_stats"] = jax.tree.map(np.asarray, state.batch_stats)
    return FoldResult(
        fold=fold,
        best_val_acc=best_val_acc,
        best_variables=best_variables,
        bundle=bundle,
        history=history,
    )
