"""Photometric augmentation, batched and elementwise (VPU-friendly).

Implements the reference chain's color stages on float32 images in [0, 255]:
ColorJitter (`dataset.py:211`, torchvision semantics: random op order,
blend-based brightness/contrast/saturation, HSV hue rotation) and the
OneOf{RGBShift, HueSaturationValue, ToGray} group (`dataset.py:212-216`).
Working in float avoids the uint8 quantization of the CPU pipeline — a
strictly more faithful signal; all ops clip back to [0, 255].
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_GRAY_WEIGHTS = jnp.array([0.299, 0.587, 0.114])


def rgb_to_grayscale(img: jnp.ndarray) -> jnp.ndarray:
    """ITU-R 601 luma, keepdims; matches torchvision/OpenCV weights."""
    w = _GRAY_WEIGHTS.astype(img.dtype) if jnp.issubdtype(
        img.dtype, jnp.floating) else _GRAY_WEIGHTS
    return jnp.tensordot(img, w, axes=[[-1], [0]])[..., None]


def rgb_to_hsv(img: jnp.ndarray) -> jnp.ndarray:
    """RGB [0,255] -> H [0,1), S [0,1], V [0,255]."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    safe = jnp.where(delta > 0, delta, 1.0)
    s = jnp.where(maxc > 0, delta / jnp.where(maxc > 0, maxc, 1.0), 0.0)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(delta > 0, (h / 6.0) % 1.0, 0.0)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    # Branch-free select chain (jnp.choose lowers to a slow gather on TPU).
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6

    def pick(c0, c1, c2, c3, c4, c5):
        out = jnp.where(i == 0, c0, c1)
        out = jnp.where(i == 2, c2, out)
        out = jnp.where(i == 3, c3, out)
        out = jnp.where(i == 4, c4, out)
        return jnp.where(i == 5, c5, out)

    r = pick(v, q, p, p, t, v)
    g = pick(t, v, v, q, p, p)
    b = pick(p, p, t, v, v, q)
    return jnp.stack([r, g, b], axis=-1)


# --------------------------------------------------------------------------
# ColorJitter
# --------------------------------------------------------------------------

class ColorJitterCfg(NamedTuple):
    prob: float = 0.5
    brightness: float = 0.2
    contrast: float = 0.2
    saturation: float = 0.2
    hue: float = 0.1


def _adjust_brightness(img: jnp.ndarray, factor: jnp.ndarray) -> jnp.ndarray:
    return img * factor


def _adjust_contrast(img: jnp.ndarray, factor: jnp.ndarray) -> jnp.ndarray:
    mean = jnp.mean(rgb_to_grayscale(img), axis=(-3, -2, -1), keepdims=True)
    return mean + factor * (img - mean)


def _adjust_saturation(img: jnp.ndarray, factor: jnp.ndarray) -> jnp.ndarray:
    gray = rgb_to_grayscale(img)
    return gray + factor * (img - gray)


def _adjust_hue(img: jnp.ndarray, shift: jnp.ndarray) -> jnp.ndarray:
    hsv = rgb_to_hsv(img)
    h = (hsv[..., 0] + shift) % 1.0
    return hsv_to_rgb(jnp.stack([h, hsv[..., 1], hsv[..., 2]], axis=-1))


def color_jitter(
    images: jnp.ndarray, key: jax.Array, cfg: ColorJitterCfg
) -> jnp.ndarray:
    """torchvision-style ColorJitter: per-sample random factors AND random
    application order of the four ops (`dataset.py:211`).

    SPMD formulation: instead of a per-sample vmap(switch) — which
    serializes on TPU — each of the 4 rounds computes all four adjustments
    *batched* and per-sample selects by the sampled permutation. 16 batched
    elementwise ops total; no per-sample control flow.
    """
    B = images.shape[0]
    k_apply, k_b, k_c, k_s, k_h, k_perm = jax.random.split(key, 6)
    apply = jax.random.bernoulli(k_apply, cfg.prob, (B,))
    fb = jax.random.uniform(
        k_b, (B, 1, 1, 1), minval=max(0.0, 1 - cfg.brightness),
        maxval=1 + cfg.brightness,
    )
    fc = jax.random.uniform(
        k_c, (B, 1, 1, 1), minval=max(0.0, 1 - cfg.contrast),
        maxval=1 + cfg.contrast,
    )
    fs = jax.random.uniform(
        k_s, (B, 1, 1, 1), minval=max(0.0, 1 - cfg.saturation),
        maxval=1 + cfg.saturation,
    )
    fh = jax.random.uniform(k_h, (B, 1, 1), minval=-cfg.hue, maxval=cfg.hue)
    perms = jax.vmap(lambda k: jax.random.permutation(k, 4))(
        jax.random.split(k_perm, B)
    )  # (B, 4) — order of ops per sample

    fb = fb.astype(images.dtype)
    fc = fc.astype(images.dtype)
    fs = fs.astype(images.dtype)
    fh = fh.astype(images.dtype)
    x = images
    for step in range(4):
        op = perms[:, step][:, None, None, None]
        bright = _adjust_brightness(x, fb)
        contrast = _adjust_contrast(x, fc)
        sat = _adjust_saturation(x, fs)
        hue = _adjust_hue(x, fh)
        x = jnp.where(
            op == 0, bright,
            jnp.where(op == 1, contrast, jnp.where(op == 2, sat, hue)),
        )
    x = jnp.clip(x, 0.0, 255.0)
    return jnp.where(apply[:, None, None, None], x, images)


# --------------------------------------------------------------------------
# OneOf {RGBShift, HueSaturationValue, ToGray}
# --------------------------------------------------------------------------

class ColorShiftCfg(NamedTuple):
    prob: float = 0.3
    rgb_shift_limit: float = 20.0
    hsv_hue_limit: float = 20.0   # OpenCV hue units (2 degrees each)
    hsv_sat_limit: float = 30.0   # 0..255 scale
    hsv_val_limit: float = 20.0   # 0..255 scale


def rgb_shift(images: jnp.ndarray, key: jax.Array, limit: float) -> jnp.ndarray:
    B = images.shape[0]
    shift = jax.random.uniform(key, (B, 1, 1, 3), minval=-limit, maxval=limit)
    return jnp.clip(images + shift.astype(images.dtype), 0.0, 255.0)


def hue_saturation_value(
    images: jnp.ndarray, key: jax.Array, cfg: ColorShiftCfg
) -> jnp.ndarray:
    """albumentations HueSaturationValue (`dataset.py:214`): hue shifts in
    OpenCV's 0..180 hue space (wraps), sat/val shift additively in 0..255."""
    B = images.shape[0]
    kh, ks, kv = jax.random.split(key, 3)
    dh = jax.random.uniform(
        kh, (B, 1, 1), minval=-cfg.hsv_hue_limit, maxval=cfg.hsv_hue_limit
    )
    dsat = jax.random.uniform(
        ks, (B, 1, 1), minval=-cfg.hsv_sat_limit, maxval=cfg.hsv_sat_limit
    )
    dval = jax.random.uniform(
        kv, (B, 1, 1), minval=-cfg.hsv_val_limit, maxval=cfg.hsv_val_limit
    )
    hsv = rgb_to_hsv(images)
    dt = images.dtype
    h = (hsv[..., 0] + (dh / 180.0).astype(dt)) % 1.0
    s = jnp.clip(hsv[..., 1] + (dsat / 255.0).astype(dt), 0.0, 1.0)
    v = jnp.clip(hsv[..., 2] + dval.astype(dt), 0.0, 255.0)
    return hsv_to_rgb(jnp.stack([h, s, v], axis=-1))


def to_gray(images: jnp.ndarray) -> jnp.ndarray:
    return jnp.broadcast_to(rgb_to_grayscale(images), images.shape)


def color_shift_oneof(
    images: jnp.ndarray, key: jax.Array, cfg: ColorShiftCfg
) -> jnp.ndarray:
    B = images.shape[0]
    k_apply, k_pick, k_rgb, k_hsv = jax.random.split(key, 4)
    apply = jax.random.bernoulli(k_apply, cfg.prob, (B,))
    pick = jax.random.randint(k_pick, (B,), 0, 3)
    shifted = rgb_shift(images, k_rgb, cfg.rgb_shift_limit)
    hsved = hue_saturation_value(images, k_hsv, cfg)
    grayed = to_gray(images)
    sel = jnp.where(
        (pick == 0)[:, None, None, None],
        shifted,
        jnp.where((pick == 1)[:, None, None, None], hsved, grayed),
    )
    return jnp.where(apply[:, None, None, None], sel, images)
