"""In-graph A/B of Config overrides on the TTA-ensemble inference path
(bench.bench_infer: 2 fold-models x 4 scale4 views, shared preprocessed
view tensor). Same contract as bench_override_ab.py. Usage:

    python tools/bench_infer_ab.py base infer_cast_params=false dwconv_impl=pallas
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
    n_batches = 20
    variants: list[dict] = []
    for a in sys.argv[1:]:
        if a.startswith("n_batches="):
            n_batches = int(a.split("=")[1])
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
        image_size=(260, 260), batch_size=32, use_deep_supervision=True,
        use_ema=True, compute_dtype="bfloat16", tta_transforms=4,
        tta_mode="scale4",
    ).validate()
    for ov in variants:
        cfg = base.replace(**ov) if ov else base
        ips = bench.bench_infer(jax, cfg, n_batches=n_batches)
        print(f"{ov or 'base'}: {ips:.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
