import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_classification_tpu.aug import randaug as R


@pytest.fixture
def img(rng):
    return rng.uniform(0, 255, size=(16, 16, 3)).astype(np.float32)


def test_gate_prob_zero(rng):
    imgs = rng.uniform(0, 255, size=(4, 16, 16, 3)).astype(np.float32)
    out = np.asarray(
        R.rand_augment(jnp.asarray(imgs), jax.random.key(0), R.RandAugmentCfg(prob=0.0))
    )
    np.testing.assert_array_equal(out, imgs)


def test_invert(img):
    out = np.asarray(R._invert(jnp.asarray(img)))
    np.testing.assert_allclose(out, 255.0 - img)


def test_posterize_matches_pil_semantics(img):
    out = np.asarray(R._posterize(jnp.asarray(img), jnp.float32(2)))
    expected = (img.astype(np.uint8) >> 6) << 6
    np.testing.assert_array_equal(out.astype(np.uint8), expected)


def test_solarize(img):
    out = np.asarray(R._solarize(jnp.asarray(img), jnp.float32(128.0)))
    inv = img >= 128
    np.testing.assert_allclose(out[inv], 255.0 - img[inv])
    np.testing.assert_allclose(out[~inv], img[~inv])


def test_autocontrast_full_range(img):
    out = np.asarray(R._autocontrast(jnp.asarray(img)))
    for c in range(3):
        assert out[..., c].min() == pytest.approx(0.0, abs=1e-3)
        assert out[..., c].max() == pytest.approx(255.0, abs=1e-3)


def test_equalize_flattens_histogram():
    # strongly skewed image -> equalize spreads values
    rng = np.random.default_rng(0)
    img = (rng.uniform(0, 1, size=(32, 32, 3)) ** 3 * 255).astype(np.float32)
    out = np.asarray(R._equalize(jnp.asarray(img)))
    assert out.std() > img.std()
    assert out.min() >= 0 and out.max() <= 255


def test_rotate_90_symmetry():
    img = np.zeros((15, 15, 3), np.float32)
    img[3, 7] = 255.0  # point above center
    out = np.asarray(R._rotate(jnp.asarray(img), jnp.float32(90.0)))
    # after 90deg CCW (cv2 convention, y down) the point moves to the left/right axis
    peak = np.unravel_index(out[..., 0].argmax(), (15, 15))
    assert peak[0] == 7  # lands on the horizontal axis through the center


def test_translate(img):
    out = np.asarray(R._translate(jnp.asarray(img), jnp.float32(0.25), 0))
    # content shifted: output at x samples source at x+4 (inverse mapping)
    np.testing.assert_allclose(out[:, 0], img[:, 4], atol=1e-3)


def test_full_randaugment_runs_and_varies(rng):
    imgs = rng.uniform(0, 255, size=(8, 24, 24, 3)).astype(np.float32)
    out = np.asarray(
        R.rand_augment(
            jnp.asarray(imgs), jax.random.key(3), R.RandAugmentCfg(prob=1.0)
        )
    )
    assert out.shape == imgs.shape
    assert np.isfinite(out).all()
    assert out.min() >= 0 and out.max() <= 255.0 + 1e-3
    changed = [not np.allclose(out[b], imgs[b]) for b in range(8)]
    assert sum(changed) >= 4  # most samples had at least one op applied


def test_pipeline_with_randaugment(rng):
    from image_classification_tpu.aug.pipeline import aug_configs_from, train_augment
    from image_classification_tpu.core.config import Config

    cfg = Config(use_randaugment=True, image_size=(32, 32), native_size=(24, 32))
    aug = aug_configs_from(cfg)
    imgs = rng.integers(0, 256, size=(2, 24, 32, 3)).astype(np.uint8)
    out = np.asarray(train_augment(jnp.asarray(imgs), jax.random.key(0), aug))
    assert out.shape == (2, 32, 32, 3)
    assert np.isfinite(out).all()
