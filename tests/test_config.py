import json

import pytest

from image_classification_tpu.core.config import Config, apply_overrides, load_config


def test_defaults_match_reference_v4():
    # Anchor values from reference config.py:1-54.
    cfg = Config()
    assert cfg.num_classes == 44
    assert cfg.image_size == (260, 260)
    assert cfg.model_name == "convnext_base"
    assert cfg.batch_size == 32
    assert cfg.epochs == 20
    assert cfg.num_folds == 3
    assert cfg.patience == 4
    assert cfg.label_smoothing == 0.1
    assert cfg.lr == 1e-4
    assert cfg.weight_decay == 1e-2
    assert cfg.gradient_accumulation_steps == 2
    assert cfg.warmup_ratio == 0.1
    assert cfg.min_lr == 1e-6
    assert cfg.ema_decay == 0.9997
    assert cfg.gradient_clip_val == 1.0
    assert cfg.mixup_alpha == 0.2
    assert cfg.cutmix_alpha == 1.0
    assert cfg.random_erasing_prob == 0.3
    assert cfg.use_deep_supervision
    assert cfg.aux_weight == 0.4


def test_overrides():
    cfg = apply_overrides(Config(), ["lr=0.001", "use_ema=false", "image_size=[224,224]"])
    assert cfg.lr == 0.001
    assert cfg.use_ema is False
    assert cfg.image_size == (224, 224)


def test_unknown_key_rejected():
    with pytest.raises(KeyError):
        apply_overrides(Config(), ["not_a_key=3"])


def test_round_trip_dict():
    cfg = Config(lr=3e-4)
    cfg2 = Config.from_dict(cfg.to_dict())
    assert cfg == cfg2


def test_load_config_file(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({"model_name": "convnext_tiny", "epochs": 2}))
    cfg = load_config(str(p), ["batch_size=16"])
    assert cfg.model_name == "convnext_tiny"
    assert cfg.epochs == 2
    assert cfg.batch_size == 16


def test_validate_rejects_bad():
    with pytest.raises(ValueError):
        Config(batch_size=3, gradient_accumulation_steps=2).validate()
