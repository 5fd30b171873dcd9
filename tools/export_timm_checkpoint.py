"""Export a trained best-checkpoint to a timm-keyed torch .pth, then
round-trip it back through the REAL ``pretrained=true`` import path and
verify the weights survive exactly.

Closes the "real pretrained-weight path exercised on a real checkpoint"
gap (VERDICT r3): the environment has no downloadable timm weights, so
real trained checkpoints (ConvNeXt-B from the hard-benchmark run;
EfficientNet-B0 / EffNetV2-S foundations for the pretrained-regime
ladder) are exported to the reference ecosystem's format
(`testdata.py:140-159` consumes ``model_state_dict``-wrapped .pth) and
re-imported via ``load_pretrained_into`` — exercising torch-file IO, key
mapping, layout transposes, BatchNorm running stats, and the
deep-supervision backbone nesting on real weights.

Usage:
  JAX_PLATFORMS=cpu python tools/export_timm_checkpoint.py \
      [config=configs/v1_effb0.json] model_save_path=... fold=1 out=....pth
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    save_path, fold, out = "demo_data_hard_default/models", 1, "/tmp/export.pth"
    preset = None
    for a in sys.argv[1:]:
        k, v = a.split("=", 1)
        if k == "model_save_path":
            save_path = v
        elif k == "fold":
            fold = int(v)
        elif k == "out":
            out = v
        elif k == "config":
            preset = v

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import torch

    from image_classification_tpu.core.config import Config
    from image_classification_tpu.models.factory import (
        create_model,
        load_pretrained_into,
    )
    from image_classification_tpu.utils import checkpoint as ckpt

    base: dict = {}
    if preset is not None:
        with open(preset) as f:
            base = {k: v for k, v in json.load(f).items()
                    if not k.startswith("_")}
    cfg = Config.from_dict({**Config().to_dict(), **base})
    bundle = create_model(cfg)
    variables = bundle.init(jax.random.key(0))
    template = {"params": variables["params"]}
    if "batch_stats" in variables:
        template["batch_stats"] = variables["batch_stats"]
    tree, meta = ckpt.load_best(save_path, fold, template)
    print(f"loaded fold-{fold} best checkpoint: val_acc={meta.get('val_acc')}")

    nested = "backbone" in tree["params"]
    params = tree["params"]["backbone"] if nested else tree["params"]
    if "convnext" in cfg.model_name:
        from image_classification_tpu.models.convnext import CONVNEXT_CONFIGS
        from image_classification_tpu.models.pretrained import export_convnext

        depths, dims = CONVNEXT_CONFIGS[cfg.model_name]
        sd = export_convnext(params, depths, dims)
    elif "efficientnet" in cfg.model_name:
        from image_classification_tpu.models.pretrained import (
            export_efficientnet,
        )

        bs = tree.get("batch_stats", {})
        sd = export_efficientnet(params, bs.get("backbone", bs) if nested else bs)
    else:
        raise ValueError(f"no export mapping for {cfg.model_name!r}")
    torch.save(
        {"model_state_dict": {k: torch.tensor(v) for k, v in sd.items()},
         "val_acc": meta.get("val_acc"), "fold": fold},
        out,
    )
    print(f"exported {len(sd)} tensors -> {out}")

    # ---- round trip through the real pretrained-import path ----
    cfg2 = cfg.replace(pretrained=True, pretrained_path=out)
    fresh = bundle.init(jax.random.key(1))
    loaded = load_pretrained_into(bundle, fresh, cfg2)
    mismatches = []

    def cmp(path, a, b):
        if not np.allclose(np.asarray(a), np.asarray(b), atol=1e-6):
            mismatches.append("/".join(str(p) for p in path))

    def sub(tree_, coll):
        t = tree_[coll]
        return t["backbone"] if nested and "backbone" in t else t

    jax.tree_util.tree_map_with_path(
        lambda p, a, b: cmp(p, a, b), sub(loaded, "params"),
        {"params": params}["params"],
    )
    if "batch_stats" in tree and tree["batch_stats"]:
        jax.tree_util.tree_map_with_path(
            lambda p, a, b: cmp(p, a, b), sub(loaded, "batch_stats"),
            sub(tree, "batch_stats"),
        )
    assert not mismatches, f"round-trip mismatches: {mismatches[:5]}"
    print(
        "round-trip OK: every backbone tensor identical after "
        "export -> torch.save -> load_pretrained_into"
    )


if __name__ == "__main__":
    main()
