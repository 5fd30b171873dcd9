"""CLI end-to-end: train + predict subcommands as a user runs them."""

import json
import os
import subprocess
import sys

import pandas as pd
import pytest

from image_classification_tpu.data import make_synthetic_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*argv, cwd=REPO):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    return subprocess.run(
        [sys.executable, "-m", "image_classification_tpu.cli", *argv],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=1200,
    )


@pytest.fixture(scope="module")
def cli_setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cli"))
    ds = make_synthetic_dataset(
        root, n_train=80, n_test=12, num_classes=4, native_size=(24, 32), seed=9
    )
    overrides = [
        f"train_dir={ds['train_dir']}",
        f"test_dir={ds['test_dir']}",
        f"train_csv={ds['train_csv']}",
        f"test_csv={ds['test_csv']}",
        f"submission_path={root}/submission.csv",
        f"model_save_path={root}/models",
        f"output_dir={root}/out",
        f"cache_dir={root}/cache",
        "num_classes=4", 'native_size=[24,32]', 'image_size=[32,32]',
        "model_name=convnext_atto", "use_deep_supervision=false",
        "use_ema=false", "batch_size=16", "epochs=1", "num_folds=2",
        "compute_dtype=float32", "tta_transforms=0",
        "distortion_prob=0", "noise_blur_prob=0", "color_jitter_prob=0",
        "color_shift_prob=0", "random_erasing_prob=0",
        "mixup_alpha=0", "cutmix_alpha=0",
    ]
    return root, overrides


def test_cli_train_writes_submission(cli_setup):
    root, overrides = cli_setup
    res = run_cli("train", *overrides)
    assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-3000:]
    sub = pd.read_csv(f"{root}/submission.csv")
    assert list(sub.columns) == ["id", "target"]     # v4 main() layout
    assert len(sub) == 12
    # metrics JSONL written
    lines = open(f"{root}/out/metrics.jsonl").read().strip().splitlines()
    assert len(lines) == 2  # 2 folds x 1 epoch
    rec = json.loads(lines[0])
    assert "val_acc" in rec and "duty_cycle" in rec


def test_cli_predict_from_checkpoints(cli_setup):
    root, overrides = cli_setup
    res = run_cli(
        "predict", "--folds", "1,2",
        *[o if not o.startswith("submission_path") else
          f"submission_path={root}/pred.csv" for o in overrides],
    )
    assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-3000:]
    sub = pd.read_csv(f"{root}/pred.csv")
    assert list(sub.columns) == ["id", "predict"]    # testdata.py layout
    assert len(sub) == 12
