"""In-graph A/B of the fused block-MLP Pallas kernel vs the XLA path on the
headline V4-recipe train step (real TPU). Usage:

    python tools/bench_blockmlp_ab.py [n_steps=20] [impls=xla,pallas]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_steps = 20
    impls = ["xla", "pallas"]
    for a in sys.argv[1:]:
        k, v = a.split("=")
        if k == "n_steps":
            n_steps = int(v)
        elif k == "impls":
            impls = v.split(",")

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
    results = {}
    for impl in impls:
        cfg = base.replace(block_mlp_impl=impl)
        ips = bench.bench_train(jax, cfg, n_steps=n_steps)
        results[impl] = ips
        print(f"block_mlp_impl={impl}: {ips:.1f} img/s "
              f"({1000 * cfg.batch_size / ips:.1f} ms/step)", flush=True)
    if len(results) == 2:
        a, b = results.get("xla"), results.get("pallas")
        if a and b:
            print(f"pallas/xla speedup: {b / a:.3f}x")


if __name__ == "__main__":
    main()
