"""In-graph A/B of arbitrary Config overrides on the headline V4-recipe
train step (real TPU). Each variant is a comma-separated k=v list; variants
are separated by spaces. Usage:

    python tools/bench_override_ab.py n_steps=30 downsample_impl=conv downsample_impl=matmul
    python tools/bench_override_ab.py base  warp_impl=pallas   # 'base' = no override
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse(v: str):
    try:
        return json.loads(v)
    except json.JSONDecodeError:
        return v


def main() -> None:
    n_steps = 30
    variants: list[dict] = []
    for a in sys.argv[1:]:
        if a.startswith("n_steps="):
            n_steps = int(a.split("=")[1])
        elif a == "base":
            variants.append({})
        else:
            variants.append(
                {k: _parse(v) for k, v in (p.split("=", 1) for p in a.split(","))}
            )

    from image_classification_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    import bench
    from image_classification_tpu.core.config import Config

    base = Config(
        model_name="convnext_base", num_classes=44, native_size=(60, 80),
        image_size=(260, 260), batch_size=32, gradient_accumulation_steps=1,
        use_deep_supervision=True, use_ema=True, compute_dtype="bfloat16",
    ).validate()
    for ov in variants:
        cfg = base.replace(**ov) if ov else base
        ips = bench.bench_train(jax, cfg, n_steps=n_steps)
        print(f"{ov or 'base'}: {ips:.1f} img/s "
              f"({1000 * cfg.batch_size / ips:.1f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
