"""A/B the validation path: eval-step throughput vs batch size.

Steady-state epochs on the critical path are ~47 s train + ~31 s evaluate
(docs/PERF_NOTES.md forensics) — evaluate runs at ~580 img/s where the
forward-only roofline should be well above the train step's 428 img/s.
This harness measures the device-side eval step (uint8 -> preprocess ->
forward -> masked sums + confusion) with chained dispatches ending in a real
host readback (the only trustworthy timing on the axon tunnel), at several
batch sizes.

Usage: python tools/bench_eval.py [n_batches]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    import jax

    from image_classification_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp

    from image_classification_tpu.core.config import Config
    from image_classification_tpu.models.factory import create_model
    from image_classification_tpu.train.step import make_eval_step
    from image_classification_tpu.train.train_state import create_train_state
    from image_classification_tpu.train.optim import build_optimizer

    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 20

    cfg = Config(
        model_name="convnext_base",
        num_classes=44,
        native_size=(60, 80),
        image_size=(260, 260),
        batch_size=32,
        use_deep_supervision=True,
        use_ema=True,
        compute_dtype="bfloat16",
    ).validate()

    bundle = create_model(cfg)
    tx = build_optimizer(cfg, cfg.lr)
    variables = bundle.init(jax.random.key(0))
    state = create_train_state(variables, tx, use_ema=True)
    eval_step = jax.jit(make_eval_step(bundle, cfg, use_ema=True))

    rng = np.random.default_rng(0)
    for mult in (2, 4, 8):
        b = cfg.batch_size * mult
        batch = {
            "image": jax.device_put(
                rng.integers(0, 256, size=(b, *cfg.native_size, 3)).astype(
                    np.uint8
                )
            ),
            "label": jax.device_put(
                rng.integers(0, cfg.num_classes, size=b).astype(np.int32)
            ),
            "mask": jax.device_put(np.ones(b, bool)),
        }
        # warm/compile; accumulate like evaluate() does so the dispatch
        # pattern matches the real validation loop
        acc = eval_step(state, batch)
        float(acc["count"])
        t0 = time.perf_counter()
        acc = None
        for _ in range(n_batches):
            m = eval_step(state, batch)
            acc = m if acc is None else jax.tree.map(jnp.add, acc, m)
        total = float(acc["count"])  # real readback: all steps executed
        dt = time.perf_counter() - t0
        print(
            f"val_batch_multiplier={mult} (batch {b}): "
            f"{total / dt:.1f} img/s ({1e3 * dt / n_batches:.1f} ms/batch)"
        )


if __name__ == "__main__":
    main()
