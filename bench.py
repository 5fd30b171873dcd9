"""Headline benchmark: ConvNeXt-Base train-step throughput (images/sec/chip)
under the full reference-V4 recipe — device-side augmentation, in-batch
MixUp/CutMix, deep supervision, grad accumulation x2, AdamW + cosine,
global-norm clip, EMA — on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline derivation (BASELINE.md): the reference reports ~5 h for the V4 run
(3 folds x 20 epochs x ~23,700 train images, `README.md:74`, `config.py`)
on a consumer GPU = ~79 images/sec *upper bound* (early stopping would only
lower it). vs_baseline = ours / 79.
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_IMAGES_PER_SEC = 79.0  # see module docstring


def main() -> None:
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

    cfg = Config(  # the reference V4 recipe (config.py:1-54)
        model_name="convnext_base",
        num_classes=44,
        native_size=(60, 80),
        image_size=(260, 260),
        batch_size=32,
        gradient_accumulation_steps=2,
        use_deep_supervision=True,
        use_ema=True,
        compute_dtype="bfloat16",
    ).validate()

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

    # warmup / compile; the float() readback forces a real device round-trip
    # (block_until_ready alone can return early on tunneled backends)
    for _ in range(3):
        state, metrics = step(state, batch, key)
    float(metrics["loss"])

    n_steps = 30
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state, batch, key)
    # the final metrics depend on the donated state chain, so this readback
    # cannot complete before every step has executed
    float(metrics["loss"])
    dt = time.perf_counter() - t0

    imgs_per_sec = n_steps * cfg.batch_size / dt
    n_chips = jax.device_count()
    per_chip = imgs_per_sec / n_chips
    print(
        json.dumps(
            {
                "metric": "convnext_base_v4_recipe_train_images_per_sec_per_chip",
                "value": round(per_chip, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(per_chip / REFERENCE_IMAGES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
