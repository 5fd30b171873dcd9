"""Per-reference-version config presets (configs/*.json).

Each preset reproduces one reference recipe (V1 / V2 / V3.1 / V4 — see the
`_comment` field citing the reference config); here every preset is loaded
through the real config path and smoke-trained via the CLI with only
size/path overrides (tiny model + tiny synthetic data), so a broken preset
key or an incompatible flag combination fails CI.
"""

import os
import subprocess
import sys

import pytest

from image_classification_tpu.core.config import load_config
from image_classification_tpu.data import make_synthetic_dataset
from tests.test_cli import REPO


def run_cli(*argv):
    """Like tests.test_cli.run_cli but on ONE CPU device: the 8-device SPMD
    compiles of four full recipes cost ~30 min; multi-device CLI coverage
    already lives in test_cli.py."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count")
    )
    return subprocess.run(
        [sys.executable, "-m", "image_classification_tpu.cli", *argv],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200,
    )

PRESETS = {
    "v1_effb0": dict(model="efficientnet_b0", schedule="plateau"),
    "v2_convbase": dict(model="convnext_base", randaug=True),
    "v3_1": dict(model="tf_efficientnetv2_s", sampler=True, swa=True),
    "v4": dict(model="convnext_base", deep_supervision=True),
}


def preset_path(name):
    return os.path.join(REPO, "configs", f"{name}.json")


def test_presets_load_and_anchor_values():
    v1 = load_config(preset_path("v1_effb0"))
    assert v1.model_name == "efficientnet_b0"
    assert v1.schedule == "plateau" and v1.plateau_metric == "train_acc"
    assert v1.lr == pytest.approx(1e-3) and v1.use_sampler
    assert v1.mix_prob == 0.0 and not v1.use_ema

    v2 = load_config(preset_path("v2_convbase"))
    assert v2.use_randaugment and v2.randaugment_magnitude == 9.0
    assert v2.ensemble_models == (
        "convnext_base", "vit_base_patch16_224", "deit_base_patch16_224"
    )
    assert v2.num_folds == 5 and v2.tta_mode == "flip6"

    v31 = load_config(preset_path("v3_1"))
    assert v31.model_name == "tf_efficientnetv2_s"
    assert v31.use_sampler and v31.use_weighted_loss and v31.use_swa
    assert v31.oversample_min_samples == 2
    assert v31.mean[0] == pytest.approx(0.8536320017130206)
    assert v31.ema_decay == pytest.approx(0.9999)

    v4 = load_config(preset_path("v4"))
    assert v4.model_name == "convnext_base" and v4.use_deep_supervision
    assert v4.gradient_accumulation_steps == 2
    assert v4.ema_decay == pytest.approx(0.9997)
    assert v4.image_size == (260, 260) and v4.num_folds == 3


@pytest.fixture(scope="module")
def preset_data(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("presets"))
    ds = make_synthetic_dataset(
        root, n_train=72, n_test=8, num_classes=6, native_size=(24, 32), seed=13
    )
    return root, ds


def _size_overrides(root, ds, tag):
    return [
        f"train_dir={ds['train_dir']}", f"test_dir={ds['test_dir']}",
        f"train_csv={ds['train_csv']}", f"test_csv={ds['test_csv']}",
        f"submission_path={root}/{tag}/submission.csv",
        f"model_save_path={root}/{tag}/models",
        f"output_dir={root}/{tag}/out",
        f"cache_dir={root}/{tag}/cache",
        "num_classes=6", "native_size=[24,32]", "image_size=[32,32]",
        "batch_size=16", "gradient_accumulation_steps=1", "epochs=1",
        "num_folds=2", "compute_dtype=float32", "use_decode_cache=false",
        "tta_transforms=0",
        # the heavy OneOf aug stages cost minutes of XLA compile per recipe
        # and are covered by test_e2e_smoke.test_full_default_recipe_integrates;
        # each preset's *distinctive* flags (sampler/focal/SWA/randaug/DS/
        # plateau/weighted loss) stay live.
        "distortion_prob=0", "noise_blur_prob=0", "color_shift_prob=0",
    ]


@pytest.mark.parametrize("name", sorted(PRESETS))
def test_preset_cli_smoke(preset_data, name):
    root, ds = preset_data
    overrides = _size_overrides(root, ds, name)
    # shrink the model but keep each recipe's distinctive flags live
    if name == "v3_1":
        overrides += ["model_name=efficientnet_b0", "swa_start_epoch=1"]
    elif name == "v1_effb0":
        pass  # efficientnet_b0 is already small enough
    else:
        overrides += ["model_name=convnext_atto"]
    if name == "v2_convbase":
        overrides += ["ensemble_models=[]", "ensemble_weights=[]"]
    res = run_cli("train", "--config", preset_path(name), *overrides)
    assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-3000:]
    assert os.path.exists(f"{root}/{name}/submission.csv")
