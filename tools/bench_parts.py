"""Component micro-benchmarks on the current JAX backend.

Usage: python tools/bench_parts.py [aug|model|step|all] [batch=32]

Measures, separately:
- aug:   the fused train augmentation pipeline (uint8 in, normalized out)
- model: ConvNeXt-Base fwd+bwd at 260x260 (no aug)
- step:  the full V4-recipe train step (aug + mix + accum + AdamW + EMA)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, warmup=2, iters=10):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    import jax
    import jax.numpy as jnp

    from image_classification_tpu.aug.pipeline import aug_configs_from, train_augment
    from image_classification_tpu.core.config import Config

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    batch = 32
    for a in sys.argv[2:]:
        if a.startswith("batch="):
            batch = int(a.split("=")[1])

    cfg = Config(batch_size=batch).validate()
    rng = np.random.default_rng(0)
    images_u8 = jnp.asarray(
        rng.integers(0, 256, size=(batch, *cfg.native_size, 3)).astype(np.uint8)
    )
    labels = jnp.asarray(rng.integers(0, 44, size=batch).astype(np.int32))
    key = jax.random.key(0)

    if which in ("aug", "all"):
        aug = aug_configs_from(cfg)
        f = jax.jit(lambda im, k: train_augment(im, k, aug))
        dt = timeit(f, images_u8, key)
        print(f"aug pipeline: {dt*1e3:.2f} ms/batch, {batch/dt:.0f} img/s")

    if which in ("model", "all"):
        from image_classification_tpu.models.factory import create_model

        bundle = create_model(cfg)
        variables = bundle.init(jax.random.key(0))
        x = jnp.zeros((batch, *cfg.image_size, 3), jnp.float32)

        def loss_fn(params, x):
            outs = bundle.module.apply(
                {"params": params}, x, deterministic=False,
                rngs={"dropout": jax.random.key(0)},
            )
            main = outs[0] if isinstance(outs, (tuple, list)) else outs
            return jnp.mean(main ** 2)

        g = jax.jit(jax.grad(loss_fn))
        dt = timeit(g, variables["params"], x, warmup=2, iters=5)
        print(f"convnext_base fwd+bwd: {dt*1e3:.2f} ms/batch, {batch/dt:.0f} img/s")

    if which in ("step", "all"):
        from image_classification_tpu.models.factory import create_model
        from image_classification_tpu.train.loss import build_criterion
        from image_classification_tpu.train.optim import build_optimizer
        from image_classification_tpu.train.step import make_train_step
        from image_classification_tpu.train.train_state import create_train_state

        bundle = create_model(cfg)
        tx = build_optimizer(cfg, cfg.lr)
        variables = bundle.init(jax.random.key(0))
        state = create_train_state(variables, tx, use_ema=True)
        step = jax.jit(make_train_step(bundle, cfg, tx, build_criterion(cfg)))
        batch_d = {"image": images_u8, "label": labels}

        for _ in range(2):
            state, m = step(state, batch_d, key)
        jax.block_until_ready(state.params)
        t0 = time.perf_counter()
        for _ in range(10):
            state, m = step(state, batch_d, key)
        jax.block_until_ready(state.params)
        dt = (time.perf_counter() - t0) / 10
        print(f"full train step: {dt*1e3:.2f} ms, {batch/dt:.0f} img/s")


if __name__ == "__main__":
    main()
