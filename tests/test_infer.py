import jax.numpy as jnp
import numpy as np
import pytest

from image_classification_tpu.core.config import Config
from image_classification_tpu.infer.tta import (
    center_crop_or_pad,
    get_tta,
    tta_views_flip6,
    tta_views_scale4,
)


@pytest.fixture
def batch(rng):
    return jnp.asarray(rng.uniform(-2, 2, size=(2, 20, 20, 3)).astype(np.float32))


def test_center_crop_larger_input(rng):
    x = jnp.asarray(rng.uniform(size=(1, 30, 30, 3)).astype(np.float32))
    out = center_crop_or_pad(x, (20, 20))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x)[:, 5:25, 5:25])


def test_center_crop_smaller_input_pads_zero(rng):
    x = jnp.asarray(rng.uniform(1, 2, size=(1, 10, 10, 3)).astype(np.float32))
    out = np.asarray(center_crop_or_pad(x, (20, 20)))
    assert out.shape == (1, 20, 20, 3)
    np.testing.assert_array_equal(out[0, 5:15, 5:15], np.asarray(x)[0])
    assert (out[0, :5] == 0).all() and (out[0, 15:] == 0).all()


def test_scale4_views(batch):
    views = tta_views_scale4(batch)
    assert len(views) == 4
    for v in views:
        assert v.shape == batch.shape
    np.testing.assert_array_equal(np.asarray(views[0]), np.asarray(batch))
    np.testing.assert_array_equal(
        np.asarray(views[1]), np.asarray(batch)[:, :, ::-1]
    )
    # scale 0.9 view: 18x18 resize centered in zero padding
    v2 = np.asarray(views[2])
    assert (v2[:, 0, :] == 0).all() and (v2[:, -1, :] == 0).all()


def test_flip6_views_match_reference_list(batch):
    views = tta_views_flip6(batch)
    assert len(views) == 6
    x = np.asarray(batch)
    np.testing.assert_array_equal(np.asarray(views[0]), x)
    np.testing.assert_array_equal(np.asarray(views[1]), x[:, :, ::-1])
    np.testing.assert_array_equal(np.asarray(views[2]), x[:, ::-1])
    np.testing.assert_array_equal(np.asarray(views[3]), x[:, ::-1, ::-1])
    # reference duplicates (example.py:303-305): views 5/6 repeat vflip/hflip
    np.testing.assert_array_equal(np.asarray(views[4]), x[:, ::-1])
    np.testing.assert_array_equal(np.asarray(views[5]), x[:, :, ::-1])


def test_get_tta_dispatch():
    assert get_tta(Config(tta_transforms=0)) is None
    assert get_tta(Config(tta_transforms=4)) is tta_views_scale4
    assert get_tta(Config(tta_transforms=4, tta_mode="flip6")) is tta_views_flip6


def test_write_submission(tmp_path):
    import pandas as pd

    from image_classification_tpu.infer.predict import write_submission

    p = str(tmp_path / "sub.csv")
    df = write_submission(["a", "b"], np.array([3, 7]), p, column="predict")
    back = pd.read_csv(p)
    assert list(back.columns) == ["id", "predict"]
    assert back["predict"].tolist() == [3, 7]


class _StubLoader:
    """Minimal DataLoader stand-in: uint8 batches + masks + ids."""

    def __init__(self, images: np.ndarray, batch_size: int):
        self.images = images
        self.bs = batch_size

    def __iter__(self):
        n = len(self.images)
        for i in range(0, n, self.bs):
            chunk = self.images[i : i + self.bs]
            pad = self.bs - len(chunk)
            if pad:
                chunk = np.concatenate([chunk, np.zeros((pad, *chunk.shape[1:]), chunk.dtype)])
            mask = np.arange(self.bs) < (self.bs - pad)
            yield {"image": jnp.asarray(chunk), "mask": jnp.asarray(mask)}

    def batch_ids(self):
        n = len(self.images)
        for i in range(0, n, self.bs):
            yield [f"id{j}" for j in range(i, min(i + self.bs, n))]


def test_stacked_ensemble_matches_sequential(rng, monkeypatch):
    """The vmapped stacked-params K-fold ensemble path must produce the same
    probabilities as the per-model sequential loop it replaces
    (`train_advanced_v4.py:349-381` semantics)."""
    import jax

    from image_classification_tpu.infer import predict as predict_mod
    from image_classification_tpu.models.factory import create_model

    cfg = Config(
        model_name="convnext_atto", num_classes=6, native_size=(24, 32),
        image_size=(32, 32), use_deep_supervision=False,
        compute_dtype="float32", tta_transforms=4,
    ).validate()
    bundle = create_model(cfg)
    v1 = bundle.init(jax.random.key(1))
    v2 = bundle.init(jax.random.key(2))
    images = rng.integers(0, 256, size=(10, 24, 32, 3)).astype(np.uint8)

    assert predict_mod._stackable([bundle, bundle], [v1, v2])
    ids_s, preds_s, probs_s = predict_mod.predict_ensemble(
        [bundle, bundle], [v1, v2], _StubLoader(images, 4), cfg
    )
    monkeypatch.setattr(predict_mod, "_stackable", lambda *a: False)
    ids_q, preds_q, probs_q = predict_mod.predict_ensemble(
        [bundle, bundle], [v1, v2], _StubLoader(images, 4), cfg
    )
    assert ids_s == ids_q
    np.testing.assert_allclose(probs_s, probs_q, atol=2e-6)
    np.testing.assert_array_equal(preds_s, preds_q)
    # distinct-architecture ensembles must NOT take the stacked path
    assert not predict_mod._stackable([bundle], [v1])
