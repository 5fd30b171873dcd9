"""Score a submission CSV against the hard benchmark's clean test labels.

The hard generator persists the clean generative test labels to
``test_labels.csv`` (`data/synthetic_hard.py`); the reference's protocol
scores ``submission.csv`` (id,predict / id,target) on Kaggle
(`train_advanced_v4.py:704-712`, `testdata.py:166-173`). This is the local
stand-in: top-1 accuracy, macro F1, min-class F1, and group accuracy
(groups of 4 confusable classes — group errors mean the model missed the
EASY family cue, not the hard signature).

Usage:
  python tools/score_submission.py submission=... labels=... [group_size=4]
"""

import json
import sys

import numpy as np
import pandas as pd


def score(sub_path: str, labels_path: str, group_size: int = 4) -> dict:
    sub = pd.read_csv(sub_path)
    lab = pd.read_csv(labels_path)
    pred_col = "predict" if "predict" in sub.columns else "target"
    merged = lab.merge(sub, on="id", suffixes=("_true", "_pred"))
    assert len(merged) == len(lab), (
        f"submission covers {len(merged)}/{len(lab)} test ids"
    )
    y = merged["target" if "target" in lab.columns else "predict"].to_numpy()
    if pred_col == "target" and "target_pred" in merged.columns:
        y = merged["target_true"].to_numpy()
        p = merged["target_pred"].to_numpy()
    else:
        p = merged[pred_col].to_numpy()
    acc = float((y == p).mean())
    classes = np.unique(y)
    f1s = []
    for c in classes:
        tp = float(((p == c) & (y == c)).sum())
        fp = float(((p == c) & (y != c)).sum())
        fn = float(((p != c) & (y == c)).sum())
        f1s.append(2 * tp / (2 * tp + fp + fn) if (2 * tp + fp + fn) else 0.0)
    return {
        "n": int(len(y)),
        "acc": round(acc, 4),
        "macro_f1": round(float(np.mean(f1s)), 4),
        "min_class_f1": round(float(np.min(f1s)), 4),
        "group_acc": round(float((y // group_size == p // group_size).mean()), 4),
    }


def main() -> None:
    sub, lab, gs = None, None, 4
    for a in sys.argv[1:]:
        k, v = a.split("=", 1)
        if k == "submission":
            sub = v
        elif k == "labels":
            lab = v
        elif k == "group_size":
            gs = int(v)
    assert sub and lab, __doc__
    print(json.dumps(score(sub, lab, gs)))


if __name__ == "__main__":
    main()
