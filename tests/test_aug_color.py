import colorsys

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_classification_tpu.aug import color as C


def test_hsv_roundtrip(rng):
    img = rng.uniform(0, 255, size=(2, 8, 8, 3)).astype(np.float32)
    back = np.asarray(C.hsv_to_rgb(C.rgb_to_hsv(jnp.asarray(img))))
    np.testing.assert_allclose(back, img, atol=1e-2)


def test_rgb_to_hsv_matches_colorsys(rng):
    px = rng.uniform(0, 255, size=(20, 3)).astype(np.float32)
    ours = np.asarray(C.rgb_to_hsv(jnp.asarray(px[None, None])))[0, 0]
    for i in range(20):
        h, s, v = colorsys.rgb_to_hsv(*(px[i] / 255.0))
        np.testing.assert_allclose(ours[i, 0], h, atol=1e-4)
        np.testing.assert_allclose(ours[i, 1], s, atol=1e-4)
        np.testing.assert_allclose(ours[i, 2], v * 255.0, atol=1e-2)


def test_grayscale_weights(rng):
    img = rng.uniform(0, 255, size=(1, 4, 4, 3)).astype(np.float32)
    g = np.asarray(C.rgb_to_grayscale(jnp.asarray(img)))
    expected = img @ np.array([0.299, 0.587, 0.114])
    np.testing.assert_allclose(g[..., 0], expected, rtol=1e-5)


def test_color_jitter_prob_zero_identity(rng):
    img = rng.uniform(0, 255, size=(2, 8, 8, 3)).astype(np.float32)
    out = np.asarray(
        C.color_jitter(jnp.asarray(img), jax.random.key(0), C.ColorJitterCfg(prob=0.0))
    )
    np.testing.assert_array_equal(out, img)


def test_color_jitter_changes_image(rng):
    img = rng.uniform(50, 200, size=(4, 8, 8, 3)).astype(np.float32)
    out = np.asarray(
        C.color_jitter(jnp.asarray(img), jax.random.key(0), C.ColorJitterCfg(prob=1.0))
    )
    assert np.abs(out - img).mean() > 0.5
    assert out.min() >= 0 and out.max() <= 255


def test_brightness_only():
    img = jnp.full((1, 4, 4, 3), 100.0)
    out = C._adjust_brightness(img, jnp.float32(1.2))
    np.testing.assert_allclose(np.asarray(out), 120.0, rtol=1e-6)


def test_contrast_only(rng):
    img = rng.uniform(0, 255, size=(1, 6, 6, 3)).astype(np.float32)
    out = np.asarray(C._adjust_contrast(jnp.asarray(img), jnp.float32(1.5)))
    mean = (img[0] @ np.array([0.299, 0.587, 0.114])).mean()
    np.testing.assert_allclose(out[0], mean + 1.5 * (img[0] - mean), rtol=1e-4)


def test_saturation_zero_is_grayscale(rng):
    img = rng.uniform(0, 255, size=(1, 6, 6, 3)).astype(np.float32)
    out = np.asarray(C._adjust_saturation(jnp.asarray(img), jnp.float32(0.0)))
    assert np.abs(out[..., 0] - out[..., 1]).max() < 1e-3


def test_hue_shift_full_cycle_identity(rng):
    img = rng.uniform(0, 255, size=(1, 6, 6, 3)).astype(np.float32)
    out = np.asarray(C._adjust_hue(jnp.asarray(img), jnp.float32(1.0)))
    np.testing.assert_allclose(out, img, atol=0.5)


def test_rgb_shift_bounds(rng):
    img = rng.uniform(0, 255, size=(4, 8, 8, 3)).astype(np.float32)
    out = np.asarray(C.rgb_shift(jnp.asarray(img), jax.random.key(0), 20.0))
    d = out - np.clip(img, 0, 255)
    assert np.abs(d).max() <= 20.0 + 1e-4
    # shift is per-channel constant where unclipped
    interior = (img > 25) & (img < 230)
    for b in range(4):
        for c in range(3):
            vals = d[b, ..., c][interior[b, ..., c]]
            if len(vals) > 1:
                assert vals.std() < 1e-3


def test_hsv_shift_matches_cv2_direction():
    # a pure-red image hue-shifted should rotate toward yellow/magenta
    img = np.zeros((1, 4, 4, 3), np.float32)
    img[..., 0] = 200.0
    cfg = C.ColorShiftCfg(hsv_hue_limit=20.0, hsv_sat_limit=0.0, hsv_val_limit=0.0)
    out = np.asarray(C.hue_saturation_value(jnp.asarray(img), jax.random.key(3), cfg))
    assert out.shape == img.shape
    # value (max channel) preserved when val shift is 0
    np.testing.assert_allclose(out.max(axis=-1), 200.0, atol=0.5)


def test_to_gray(rng):
    img = rng.uniform(0, 255, size=(2, 4, 4, 3)).astype(np.float32)
    out = np.asarray(C.to_gray(jnp.asarray(img)))
    assert np.abs(out[..., 0] - out[..., 2]).max() < 1e-4


def test_color_shift_oneof_gate(rng):
    img = rng.uniform(0, 255, size=(4, 8, 8, 3)).astype(np.float32)
    out = np.asarray(
        C.color_shift_oneof(
            jnp.asarray(img), jax.random.key(0), C.ColorShiftCfg(prob=0.0)
        )
    )
    np.testing.assert_array_equal(out, img)
