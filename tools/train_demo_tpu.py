"""End-to-end TPU validation: build a reference-scale synthetic dataset
(35,551 train / 8,889 test images, 44 classes, 60x80 JPEGs on disk), then run
the real CLI training path for a short run and report throughput/duty cycle.

Usage: python tools/train_demo_tpu.py [epochs=1] [folds=2] [n_train=35551]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(argv: list[str], shared: dict | None = None):
    """Build (or reuse) the synthetic dataset and run the real K-fold
    training path. ``shared`` optionally carries compiled steps across
    calls (tools/run_hard_ladder.py in-process mode). Returns the
    FoldResult list."""
    epochs, folds, n_train = 1, 2, 35551
    preset = None  # optional JSON preset (e.g. configs/v1_effb0.json)
    hard = False  # hard benchmark task (synthetic_hard.py) instead of easy
    data_seed = 0  # hard-task generator seed == proto_seed: a different
    # value draws a DISJOINT task (new class prototypes), used for the
    # pretrained-regime experiments (foundation trained on seed 0,
    # fine-tuned on seed 1).
    spec_overrides: dict = {}
    overrides: dict = {}
    for a in argv:
        k, v = a.split("=")
        if k == "epochs":
            epochs = int(v)
        elif k == "folds":
            folds = int(v)
        elif k == "n_train":
            n_train = int(v)
        elif k == "seed":
            data_seed = int(v)
        elif k == "config":
            preset = v
        elif k == "hard":
            hard = v.lower() in ("1", "true", "yes")
        elif k.startswith("task."):  # HardTaskSpec knob, e.g. task.signal=0.4
            spec_overrides[k[5:]] = json.loads(v)
        else:  # generic Config override, e.g. gradient_accumulation_steps=1
            try:
                overrides[k] = json.loads(v)
            except json.JSONDecodeError:
                overrides[k] = v

    from image_classification_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from image_classification_tpu.core.config import Config
    from image_classification_tpu.data import make_synthetic_dataset
    from image_classification_tpu.train.kfold import train_k_fold
    from image_classification_tpu.utils.logging import setup_logging

    t0 = time.time()
    if hard:
        from image_classification_tpu.data.synthetic_hard import (
            HardTaskSpec,
            make_hard_synthetic_dataset,
        )

        spec = HardTaskSpec(**spec_overrides)
        parts = [f"{k}{v}" for k, v in sorted(spec_overrides.items())]
        if data_seed != 0:
            parts.append(f"seed{data_seed}")
        tag = "_".join(parts) or "default"
        root = os.path.abspath(f"demo_data_hard_{tag}")
        marker = os.path.join(root, f".done_{n_train}")
        if not os.path.exists(marker):
            print(f"generating HARD synthetic dataset ({n_train} images)...")
            make_hard_synthetic_dataset(
                root, n_train=n_train, n_test=2000, spec=spec,
                native_size=(60, 80), seed=data_seed,
            )
            open(marker, "w").write("ok")
    else:
        root = os.path.abspath("demo_data")
        marker = os.path.join(root, f".done_{n_train}")
        if not os.path.exists(marker):
            print(f"generating synthetic dataset ({n_train} images)...")
            make_synthetic_dataset(
                root, n_train=n_train, n_test=200, num_classes=44,
                native_size=(60, 80), seed=0,
            )
            open(marker, "w").write("ok")
    print(f"dataset ready in {time.time()-t0:.1f}s")

    base: dict = {}
    if preset is not None:
        with open(preset) as f:
            base = {k: v for k, v in json.load(f).items()
                    if not k.startswith("_")}
    cfg = Config.from_dict({
        **Config().to_dict(),
        "model_name": "convnext_base",
        **base,
        "train_dir": os.path.join(root, "train"),
        "test_dir": os.path.join(root, "test"),
        "train_csv": os.path.join(root, "train.csv"),
        "test_csv": os.path.join(root, "sample_submission.csv"),
        "submission_path": os.path.join(root, "submission.csv"),
        "epochs": epochs,
        "num_folds": folds,
        "model_save_path": os.path.join(root, "models"),
        "output_dir": os.path.join(root, "out"),
        "cache_dir": os.path.join(root, ".cache"),
        **overrides,
    }).validate()
    setup_logging()
    return train_k_fold(cfg, shared=shared)


def main() -> None:
    results = run(sys.argv[1:])
    for r in results:
        for h in r.history:
            print(json.dumps({"fold": r.fold, **h}))


if __name__ == "__main__":
    main()
