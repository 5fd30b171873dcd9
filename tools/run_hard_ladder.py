"""Run the recipe ladder on the HARD synthetic benchmark (real TPU).

Reproduces the reference's recipe-progression experiment
(`progress.md:383-393`: V1 85.2% < V3-era < V4 91.5% on the real data) on
the hard synthetic task (data/synthetic_hard.py), plus two V4 ablations
(EMA off, mixing off) — the accuracy oracle must *rank recipes*, not
saturate. Stages run serially in one process; each writes its full log to
/tmp/ladder_<stage>.log and a JSON summary line to the ladder log.

Usage: python tools/run_hard_ladder.py [stages=v4,v3_1,abl_noema,abl_nomix]
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STAGES = {
    # stage -> (argv for tools/train_demo_tpu.py)
    #
    # Budgets: every reference version fine-tuned *pretrained* timm
    # backbones; with no egress these runs are from scratch, so the V4
    # recipe needs a longer horizon before its regularizers pay off — at 16
    # epochs the 0.9997-decay EMA still carries ~7% random-init residue and
    # EMA-validated accuracy badly lags the raw model (measured: 16-epoch
    # 2-fold V4 fold-1 best = 0.3015, /tmp/ladder_v4.log 2026-08-21, still
    # rising monotonically). The V4-family rungs therefore run 30 epochs on
    # a single 50% holdout (same val size as the reference's 2-fold).
    "v4": ["epochs=16", "folds=2", "patience=6"],
    "v4_long": ["epochs=30", "patience=10", "split_mode=holdout",
                "val_fraction=0.5", "save_state_every=0"],
    "v3_1": ["config=configs/v3_1.json", "epochs=12", "folds=2",
             "swa_start_epoch=8", "patience=8", "save_state_every=0"],
    "v1": ["config=configs/v1_effb0.json", "epochs=12", "folds=2"],
    # Ablations: V4 recipe, same holdout split, one knob off each.
    "abl_noema": ["epochs=30", "patience=10", "split_mode=holdout",
                  "val_fraction=0.5", "use_ema=false", "save_state_every=0"],
    "abl_nomix": ["epochs=30", "patience=10", "split_mode=holdout",
                  "val_fraction=0.5", "mixup_alpha=0.0", "cutmix_alpha=0.0",
                  "mix_prob=0.0", "save_state_every=0"],
    # V1-recipe ablations — the reference's own documented effects in a
    # regime where from-scratch accuracy discriminates: imbalance handling
    # lifts min-class F1 (`progress.md:391-393`), and the aug stack buys
    # the invariances the hard task's geometric/color nuisances demand.
    "abl_v1_nosampler": ["config=configs/v1_effb0.json", "epochs=12",
                         "folds=2", "use_sampler=false",
                         "oversample_min_samples=0", "save_state_every=0"],
    "abl_v1_noaug": ["config=configs/v1_effb0.json", "epochs=12", "folds=2",
                     "hflip_prob=0.0", "ssr_prob=0.0", "rotate_limit=0.0",
                     "color_jitter_prob=0.0", "save_state_every=0"],
    # Wall-clock-faithful V4 budget: the reference's 5 h x 79 img/s
    # (`README.md:73-75`, BASELINE.md) ~= 1.4M images ~= 80 epochs of the
    # 17.8k-image holdout train split.
    "v4_80": ["epochs=80", "patience=20", "split_mode=holdout",
              "val_fraction=0.5", "save_state_every=0"],
}


def main() -> None:
    stages = ["v4", "v3_1", "abl_noema", "abl_nomix"]
    for a in sys.argv[1:]:
        if a.startswith("stages="):
            stages = a.split("=", 1)[1].split(",")
    for stage in stages:
        args = STAGES[stage]
        log = f"/tmp/ladder_{stage}.log"
        print(f"[ladder] {stage}: {' '.join(args)} -> {log}", flush=True)
        t0 = time.time()
        with open(log, "w") as f:
            r = subprocess.run(
                [sys.executable, os.path.join(REPO, "tools/train_demo_tpu.py"),
                 "hard=true", "n_train=35551", *args],
                stdout=f, stderr=subprocess.STDOUT, cwd=REPO,
            )
        best = _collect_best(log)
        print(json.dumps({
            "stage": stage, "rc": r.returncode,
            "wall_min": round((time.time() - t0) / 60, 1), **best,
        }), flush=True)


def _collect_best(log: str) -> dict:
    """Pull per-fold best val acc lines out of a train_demo log."""
    best: dict = {}
    hist = []
    with open(log) as f:
        for line in f:
            if "best val acc" in line and "done:" in line:
                # "fold N done: best val acc X"
                try:
                    fold = line.split("fold ")[1].split(" ")[0]
                    acc = float(line.rsplit("best val acc", 1)[1].strip())
                    best[f"fold{fold}_best_acc"] = acc
                except (IndexError, ValueError):
                    pass
            elif line.startswith("{"):
                try:
                    hist.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
    if hist:
        try:
            best["max_val_acc"] = max(h.get("val_acc", 0.0) for h in hist)
            best["max_macro_f1"] = max(h.get("val_macro_f1", 0.0) for h in hist)
            best["max_min_class_f1"] = max(
                h.get("val_min_class_f1", 0.0) for h in hist
            )
        except (TypeError, ValueError):
            pass
    return best


if __name__ == "__main__":
    main()
