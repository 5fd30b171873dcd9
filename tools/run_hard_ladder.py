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

# ---------------------------------------------------------------------------
# Pretrained-regime stages (round 5): every reference version fine-tunes
# ImageNet-pretrained timm backbones (`train_advanced_v4.py:488-494`,
# `V3.2/train.py:88-114`); its EMA/mixup/LR defaults are calibrated for that
# start. With no egress, the analogue is: the v4_80 model trained on the
# seed-0 hard draw (0.9100 val) exported to a timm-keyed .pth is the
# "foundation"; fine-tuning runs on the DISJOINT seed-1 draw (different
# class prototypes — the transfer is generic texture features, like
# ImageNet -> Kaggle). Budgets are reference-ish (12-16 epochs).
# ---------------------------------------------------------------------------
_FOUNDATION = "demo_data_hard_default/foundation_convnext_b.pth"
_PRE = ["seed=1", "pretrained=true", f"pretrained_path={_FOUNDATION}",
        "pretrained_strip_head=true", "save_state_every=0"]
_HOLD = ["epochs=12", "patience=8", "split_mode=holdout", "val_fraction=0.5"]
def _save(tag: str) -> str:
    # Each stage keeps its own checkpoint dir so later stages never
    # overwrite an earlier stage's best model (the seed-0 v4_80 checkpoint
    # is the foundation source and must survive).
    return f"model_save_path=demo_data_hard_seed1/models_{tag}"


STAGES.update({
    # Foundation: the seed-0 draw at a budget the 80-ep curve shows reaches
    # strong features (ep 48 of the r4 run = 0.826 val; a 48-ep cosine
    # lands its LR floor there, so the landed model is better still).
    "v4_found": ["epochs=48", "patience=48", "split_mode=holdout",
                 "val_fraction=0.5", "save_state_every=0",
                 "model_save_path=demo_data_hard_default/models_found"],
    # V4 fine-tune + one-knob ablations, same 50% holdout of the seed-1 draw.
    "pre_v4": [*_PRE, *_HOLD, _save("pre_v4")],
    "pre_noema": [*_PRE, *_HOLD, "use_ema=false", _save("pre_noema")],
    "pre_nomix": [*_PRE, *_HOLD, "mixup_alpha=0.0", "cutmix_alpha=0.0",
                  "mix_prob=0.0", _save("pre_nomix")],
    "pre_nods": [*_PRE, *_HOLD, "use_deep_supervision=false",
                 _save("pre_nods")],
    # EMA window matched to the budget: the reference's 0.9997 decay is
    # calibrated for its ~21k-optimizer-step fine-tunes
    # (`train_advanced_v4.py:628-634`); this 12-ep holdout run is 6.7k
    # steps, where 0.9997 still carries ~13% init residue
    # (0.9997^6660 = e^-2). 0.999 (window 1k steps, residue ~0.1%) tests
    # the EMA *mechanism* at a window that fits the budget, separating
    # "EMA hurts" from "this decay needs more steps than the budget has".
    "pre_ema999": [*_PRE, *_HOLD, "ema_decay=0.999", _save("pre_ema999")],
    # From-scratch control at the identical budget/split/task.
    "scratch_ctrl": ["seed=1", "save_state_every=0", *_HOLD,
                     _save("scratch_ctrl")],
    # The reference's actual protocol (train_advanced_v4.py:562-655):
    # stratified K-fold, per-fold models, ensemble prediction (scored
    # separately against the clean test labels via tools/score_submission.py).
    "pre_kfold": [*_PRE, "epochs=12", "patience=8", "folds=2",
                  _save("pre_kfold")],
    # V1 / V3.1 rungs from a pretrained start (their own foundations are
    # trained on the seed-0 draw by the *_found stages, exported with
    # tools/export_timm_checkpoint.py model=... and fine-tuned here).
    "v1_found": ["config=configs/v1_effb0.json", "epochs=40", "patience=12",
                 "split_mode=holdout", "val_fraction=0.5",
                 "save_state_every=0",
                 "model_save_path=demo_data_hard_default/models_v1found"],
    "v3_1_found": ["config=configs/v3_1.json", "epochs=40", "patience=12",
                   "split_mode=holdout", "val_fraction=0.5",
                   "lr=0.001", "use_swa=false",
                   "save_state_every=0",
                   "model_save_path=demo_data_hard_default/models_v31found"],
    "pre_v1": ["config=configs/v1_effb0.json", "epochs=12", "folds=2",
               "seed=1", "pretrained=true", "pretrained_strip_head=true",
               "save_state_every=0",
               "pretrained_path=demo_data_hard_default/foundation_effb0.pth",
               _save("pre_v1")],
    "pre_v3_1": ["config=configs/v3_1.json", "epochs=12", "folds=2",
                 "seed=1", "pretrained=true", "pretrained_strip_head=true",
                 "swa_start_epoch=8", "patience=8", "save_state_every=0",
                 "pretrained_path=demo_data_hard_default/foundation_effv2s.pth",
                 _save("pre_v3_1")],
})


# ---------------------------------------------------------------------------
# Special (non-training) stages: checkpoint export between training stages
# (CPU subprocess — must not touch the TPU the parent holds) and the
# reference's ensemble-predict + clean-test scoring protocol
# (`train_advanced_v4.py:690-712`, `testdata.py:166-173`), run in-process so
# the TPU client is shared with the training stages.
# ---------------------------------------------------------------------------
_SEED1 = "demo_data_hard_seed1"


def _export(model_save_path: str, out: str, config: str | None = None) -> dict:
    cmd = [sys.executable, os.path.join(REPO, "tools/export_timm_checkpoint.py"),
           f"model_save_path={model_save_path}", "fold=1", f"out={out}"]
    if config:
        cmd.append(f"config={config}")
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    r = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True, text=True)
    print(r.stdout[-2000:], r.stderr[-2000:] if r.returncode else "", flush=True)
    return {"rc": r.returncode, "out": out}


def _predict_and_score(tag: str, config: str | None = None,
                       model_name: str = "convnext_base") -> dict:
    """Ensemble-predict the seed-1 test set from the stage's 2 fold
    checkpoints and score against the clean generative labels."""
    import argparse

    from image_classification_tpu import cli
    from tools.score_submission import score

    sub_path = os.path.join(REPO, _SEED1, f"submission_{tag}.csv")
    overrides = [
        f"model_name={model_name}",
        f"train_dir={_SEED1}/train", f"train_csv={_SEED1}/train.csv",
        f"test_dir={_SEED1}/test", f"test_csv={_SEED1}/sample_submission.csv",
        f"model_save_path={_SEED1}/models_{tag}",
        f"submission_path={sub_path}",
        f"cache_dir={_SEED1}/.cache", "num_folds=2",
    ]
    args = argparse.Namespace(config=config, resume=False, folds=[1, 2],
                              best_fold=False, metric="acc",
                              overrides=overrides)
    cli.cmd_predict(args)
    result = score(sub_path, os.path.join(REPO, _SEED1, "test_labels.csv"))
    return {"ensemble_test": result}


SPECIAL = {
    "export_v4": lambda: _export("demo_data_hard_default/models_found",
                                 _FOUNDATION),
    "export_v1": lambda: _export(
        "demo_data_hard_default/models_v1found",
        "demo_data_hard_default/foundation_effb0.pth",
        config="configs/v1_effb0.json"),
    "export_v3_1": lambda: _export(
        "demo_data_hard_default/models_v31found",
        "demo_data_hard_default/foundation_effv2s.pth",
        config="configs/v3_1.json"),
    "predict_pre_kfold": lambda: _predict_and_score("pre_kfold"),
    "predict_pre_v1": lambda: _predict_and_score(
        "pre_v1", config="configs/v1_effb0.json",
        model_name="efficientnet_b0"),
    "predict_pre_v3_1": lambda: _predict_and_score(
        "pre_v3_1", config="configs/v3_1.json",
        model_name="tf_efficientnetv2_s"),
}


def main() -> None:
    stages = ["v4", "v3_1", "abl_noema", "abl_nomix"]
    inprocess = False
    for a in sys.argv[1:]:
        if a.startswith("stages="):
            stages = a.split("=", 1)[1].split(",")
        elif a.startswith("inprocess="):
            inprocess = a.split("=", 1)[1].lower() in ("1", "true", "yes")
    if inprocess:
        _run_inprocess(stages)
        return
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


def _run_inprocess(stages: list[str]) -> None:
    """Run stages serially in ONE process, sharing compiled steps between
    stages whose programs are identical (train/loop.py ``program_sig``
    gates the reuse). Remote XLA compiles cost minutes each on this
    platform and are NOT intercepted by the persistent cache, so e.g.
    pre_v4 / scratch16 / pre_kfold — identical programs, different init
    and splits — compile once instead of three times."""
    sys.path.insert(0, REPO)
    from tools.train_demo_tpu import run

    shared: dict = {}
    for stage in stages:
        if stage in SPECIAL:
            t0 = time.time()
            try:
                extra = SPECIAL[stage]()
            except Exception as e:
                import traceback

                traceback.print_exc()
                print(json.dumps({"stage": stage, "error": repr(e)}),
                      flush=True)
                continue
            print(json.dumps({
                "stage": stage,
                "wall_min": round((time.time() - t0) / 60, 1),
                **(extra or {}),
            }), flush=True)
            continue
        args = ["hard=true", "n_train=35551", *STAGES[stage]]
        print(f"[ladder] {stage} (in-process): {' '.join(args)}", flush=True)
        t0 = time.time()
        try:
            results = run(args, shared=shared)
        except Exception as e:  # a failed stage must not kill the ladder
            import traceback

            traceback.print_exc()
            print(json.dumps({"stage": stage, "error": repr(e)}), flush=True)
            continue
        best: dict = {}
        hist = [h for r in results for h in r.history]
        for r in results:
            best[f"fold{r.fold}_best_acc"] = round(r.best_val_acc, 4)
        if hist:
            best["max_val_acc"] = max(h.get("val_acc", 0.0) for h in hist)
            best["max_macro_f1"] = max(h.get("val_macro_f1", 0.0) for h in hist)
            best["max_min_class_f1"] = max(
                h.get("val_min_class_f1", 0.0) for h in hist
            )
        print(json.dumps({
            "stage": stage, "rc": 0,
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
