"""Tests for the hard synthetic benchmark generator (data/synthetic_hard.py).

The generator exists to keep val accuracy *discriminating* (reference
`progress.md:383-393` recipe ladder); these tests pin the structural
properties that make that work: group-confined label noise at the requested
rate, real within-group class signal, group-level color cues, and bitwise
determinism.
"""

import json
import os

import numpy as np
import pytest

from image_classification_tpu.data.synthetic_hard import (
    HardTaskSpec,
    apply_label_noise,
    build_prototypes,
    hard_synthetic_images,
    make_hard_synthetic_dataset,
)


def test_label_noise_rate_and_group_confinement():
    spec = HardTaskSpec(label_noise=0.1)
    labels = np.random.default_rng(0).integers(0, 44, size=20000)
    noisy = apply_label_noise(labels, spec, seed=3)
    flip = noisy != labels
    assert 0.08 < flip.mean() < 0.12
    assert (spec.group_of(noisy[flip]) == spec.group_of(labels[flip])).all()
    assert (noisy < spec.num_classes).all() and (noisy >= 0).all()
    # zero noise is the identity
    assert np.array_equal(
        apply_label_noise(labels, HardTaskSpec(label_noise=0.0), 3), labels
    )


def test_render_determinism_and_format():
    spec = HardTaskSpec()
    labels = np.arange(44)
    a = hard_synthetic_images(labels, spec, native_size=(60, 80), seed=5)
    b = hard_synthetic_images(labels, spec, native_size=(60, 80), seed=5)
    assert np.array_equal(a, b)
    assert a.shape == (44, 60, 80, 3) and a.dtype == np.uint8
    # different seed -> different images
    c = hard_synthetic_images(labels, spec, native_size=(60, 80), seed=6)
    assert not np.array_equal(a, c)
    # chunking must not change the stream
    d = hard_synthetic_images(labels, spec, native_size=(60, 80), seed=5, chunk=7)
    assert np.array_equal(a, d)


def test_within_group_signal_exists():
    """With nuisances off, images of different classes in the same group
    must differ (the class signature carries signal), and images of the
    same class must coincide."""
    spec = HardTaskSpec(
        mix_max=0.0, noise_sigma=0.0, rot_deg=0.0, scale_jitter=0.0,
        trans_frac=0.0, gain_jitter=0.0, bias_jitter=0.0, occl_prob=0.0,
    )
    labels = np.array([0, 0, 1, 2, 3])
    imgs = hard_synthetic_images(labels, spec, seed=0).astype(np.float32)
    assert np.array_equal(imgs[0], imgs[1])  # same class, nuisances off
    for other in (2, 3, 4):
        diff = np.abs(imgs[0] - imgs[other]).mean()
        assert diff > 2.0, f"class 0 vs {labels[other]} mean diff {diff}"


def test_color_is_group_level_only():
    protos = build_prototypes(HardTaskSpec(), seed=0)
    spec = HardTaskSpec()
    # one color row per group, used by all classes of the group
    assert protos["colors"].shape == (spec.n_groups, 3)
    # different groups get different colors with overwhelming probability
    assert len({tuple(np.round(c, 6)) for c in protos["colors"]}) == spec.n_groups


def test_dataset_layout(tmp_path):
    spec = HardTaskSpec(label_noise=0.2)
    out = make_hard_synthetic_dataset(
        str(tmp_path), n_train=60, n_test=10, spec=spec,
        native_size=(24, 32), seed=0,
    )
    import pandas as pd

    tr = pd.read_csv(out["train_csv"])
    assert list(tr.columns) == ["id", "target"]
    assert len(tr) == 60
    clean = pd.read_csv(os.path.join(str(tmp_path), "train_clean.csv"))
    # csv noisy labels differ from clean for some rows, all in-group
    noisy, cl = tr["target"].to_numpy(), clean["target"].to_numpy()
    assert (noisy != cl).any()
    assert (spec.group_of(noisy) == spec.group_of(cl)).all()
    testlab = pd.read_csv(os.path.join(str(tmp_path), "test_labels.csv"))
    assert len(testlab) == 10
    with open(os.path.join(str(tmp_path), "task_spec.json")) as f:
        saved = json.load(f)
    assert saved["label_noise"] == 0.2
    assert saved["bayes_ceiling"] == pytest.approx(0.8)
    # images exist and decode
    import cv2

    img = cv2.imread(os.path.join(out["train_dir"], "tr00000.jpg"))
    assert img is not None and img.shape == (24, 32, 3)


def test_bayes_ceiling_helper():
    assert HardTaskSpec(label_noise=0.06).bayes_ceiling() == pytest.approx(0.94)
