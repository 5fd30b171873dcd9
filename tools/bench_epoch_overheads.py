"""Time the per-epoch NON-train costs: validation pass, best-checkpoint
save (device->host pull + orbax write), and full train-state save.

Motivation: the full-scale TPU demo showed steady-state epoch walls of
~240 s with only ~47 s in the train window — ~80% of time-to-accuracy goes
to epoch boundaries (docs/PERF_NOTES.md). This tool attributes it.

Usage: python tools/bench_epoch_overheads.py [n_val=17776] [batch=64]
Reuses demo_data (run tools/train_demo_tpu.py once first).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_val, batch = 17776, 64
    for a in sys.argv[1:]:
        k, v = a.split("=")
        if k == "n_val":
            n_val = int(v)
        elif k == "batch":
            batch = int(v)

    import jax

    from image_classification_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from image_classification_tpu.core.config import Config
    from image_classification_tpu.data.loader import DataLoader
    from image_classification_tpu.data.manifest import Manifest
    from image_classification_tpu.models.factory import create_model
    from image_classification_tpu.train.kfold import build_source
    from image_classification_tpu.train.loop import build_lr_schedule, evaluate
    from image_classification_tpu.train.optim import build_optimizer
    from image_classification_tpu.train.step import make_eval_step
    from image_classification_tpu.train.train_state import create_train_state
    from image_classification_tpu.utils import checkpoint as ckpt

    root = os.path.abspath("demo_data")
    cfg = Config(
        train_dir=os.path.join(root, "train"),
        train_csv=os.path.join(root, "train.csv"),
        model_save_path=os.path.join(root, "models_ovh"),
        output_dir=os.path.join(root, "out_ovh"),
        cache_dir=os.path.join(root, ".cache"),
        model_name="convnext_base",
        use_deep_supervision=True,
        use_ema=True,
        compute_dtype="bfloat16",
    ).validate()

    manifest = Manifest.from_csv(cfg.train_csv, num_classes=cfg.num_classes)
    source = build_source(cfg, manifest, cfg.train_dir)
    idx = np.arange(min(n_val, len(manifest)))
    val_loader = DataLoader(source, manifest, idx, batch_size=batch)

    bundle = create_model(cfg)
    tx = build_optimizer(cfg, build_lr_schedule(cfg, steps_per_epoch=100))
    variables = bundle.init(jax.random.key(0))
    state = create_train_state(variables, tx, use_ema=True)
    eval_step = jax.jit(make_eval_step(bundle, cfg))

    # compile warmup (one batch)
    for b in val_loader:
        jax.block_until_ready(eval_step(state, b)["loss_sum"])
        break

    t0 = time.perf_counter()
    val = evaluate(eval_step, state, val_loader)
    t_eval = time.perf_counter() - t0
    print(
        f"evaluate: {t_eval:.1f}s for {len(idx)} imgs "
        f"({len(idx)/t_eval:.0f} img/s) acc={val['accuracy']:.4f}",
        flush=True,
    )

    t0 = time.perf_counter()
    eval_params = state.eval_params(use_ema=cfg.use_ema)
    host_params = jax.tree.map(np.asarray, eval_params)
    t_pull = time.perf_counter() - t0
    nbytes = sum(a.nbytes for a in jax.tree.leaves(host_params))
    print(
        f"param pull (device->host): {t_pull:.1f}s for {nbytes/1e6:.0f} MB "
        f"({nbytes/1e6/t_pull:.0f} MB/s)",
        flush=True,
    )

    t0 = time.perf_counter()
    ckpt.save_best(cfg.model_save_path, 1, host_params, None, 0.5)
    print(f"save_best (orbax write of host tree): {time.perf_counter()-t0:.1f}s",
          flush=True)

    t0 = time.perf_counter()
    ckpt.save_train_state(cfg.output_dir, 1, state, 0, cfg, host_state={})
    t_state = time.perf_counter() - t0
    sbytes = sum(
        a.nbytes for a in jax.tree.leaves(state) if hasattr(a, "nbytes")
    )
    print(
        f"save_train_state: {t_state:.1f}s for {sbytes/1e6:.0f} MB "
        f"({sbytes/1e6/t_state:.0f} MB/s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
