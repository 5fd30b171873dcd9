"""Capture a jax.profiler trace of the headline train step (bench.py config).

Usage: python tools/profile_step.py [outdir=/tmp/prof_step] [steps=5]
Then:  python tools/parse_profile.py /tmp/prof_step --by source
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir = "/tmp/prof_step"
    n_trace = 5
    overrides: dict = {}
    for a in sys.argv[1:]:
        if a.startswith("outdir="):
            outdir = a.split("=", 1)[1]
        elif a.startswith("steps="):
            n_trace = int(a.split("=", 1)[1])
        else:  # generic Config override, e.g. pin_layout=true
            k, v = a.split("=", 1)
            overrides[k] = {"true": True, "false": False}.get(
                v.lower(), int(v) if v.lstrip("-").isdigit() else v
            )

    import jax

    from image_classification_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from image_classification_tpu.core.config import Config
    from image_classification_tpu.models.factory import create_model
    from image_classification_tpu.train.loop import build_lr_schedule
    from image_classification_tpu.train.loss import build_criterion
    from image_classification_tpu.train.optim import build_optimizer
    from image_classification_tpu.train.step import make_train_step
    from image_classification_tpu.train.train_state import create_train_state

    cfg = Config(
        model_name="convnext_base",
        num_classes=44,
        native_size=(60, 80),
        image_size=(260, 260),
        batch_size=32,
        gradient_accumulation_steps=1,
        use_deep_supervision=True,
        use_ema=True,
        compute_dtype="bfloat16",
        **overrides,
    ).validate()
    if overrides:
        print(f"overrides: {overrides}", flush=True)

    bundle = create_model(cfg)
    schedule = build_lr_schedule(cfg, steps_per_epoch=740)
    tx = build_optimizer(cfg, schedule)
    variables = bundle.init(jax.random.key(0))
    state = create_train_state(variables, tx, use_ema=True)
    step = jax.jit(
        make_train_step(bundle, cfg, tx, build_criterion(cfg)),
        donate_argnums=(0,),
    )

    rng = np.random.default_rng(0)
    batch = {
        "image": jax.device_put(
            rng.integers(0, 256, size=(cfg.batch_size, *cfg.native_size, 3)).astype(
                np.uint8
            )
        ),
        "label": jax.device_put(
            rng.integers(0, cfg.num_classes, size=cfg.batch_size).astype(np.int32)
        ),
    }
    key = jax.random.key(1)

    t0 = time.perf_counter()
    for _ in range(3):
        state, metrics = step(state, batch, key)
    float(metrics["loss"])
    print(f"compile+warmup: {time.perf_counter() - t0:.1f}s", flush=True)

    # throughput window (chained steps ending in a real readback)
    n = 30
    t0 = time.perf_counter()
    for _ in range(n):
        state, metrics = step(state, batch, key)
    float(metrics["loss"])
    dt = time.perf_counter() - t0
    print(f"throughput: {n * cfg.batch_size / dt:.1f} img/s "
          f"({dt / n * 1e3:.1f} ms/step)", flush=True)

    with jax.profiler.trace(outdir):
        for _ in range(n_trace):
            state, metrics = step(state, batch, key)
        float(metrics["loss"])
    print(f"trace written to {outdir}", flush=True)


if __name__ == "__main__":
    main()
