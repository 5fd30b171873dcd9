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
    return jnp.tensordot(img, _GRAY_WEIGHTS, axes=[[-1], [0]])[..., None]


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
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.choose(i, [v, q, p, p, t, v], mode="clip")
    g = jnp.choose(i, [t, v, v, q, p, p], mode="clip")
    b = jnp.choose(i, [p, p, t, v, v, q], mode="clip")
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
    application order of the four ops (`dataset.py:211`)."""
    B = images.shape[0]
    k_apply, k_b, k_c, k_s, k_h, k_perm = jax.random.split(key, 6)
    apply = jax.random.bernoulli(k_apply, cfg.prob, (B,))
    fb = jax.random.uniform(
        k_b, (B,), minval=max(0.0, 1 - cfg.brightness), maxval=1 + cfg.brightness
    )
    fc = jax.random.uniform(
        k_c, (B,), minval=max(0.0, 1 - cfg.contrast), maxval=1 + cfg.contrast
    )
    fs = jax.random.uniform(
        k_s, (B,), minval=max(0.0, 1 - cfg.saturation), maxval=1 + cfg.saturation
    )
    fh = jax.random.uniform(k_h, (B,), minval=-cfg.hue, maxval=cfg.hue)
    perms = jax.vmap(lambda k: jax.random.permutation(k, 4))(
        jax.random.split(k_perm, B)
    )

    def one(img, fb, fc, fs, fh, perm):
        def step(i, im):
            op = perm[i]
            return jax.lax.switch(
                op,
                [
                    lambda x: _adjust_brightness(x, fb),
                    lambda x: _adjust_contrast(x, fc),
                    lambda x: _adjust_saturation(x, fs),
                    lambda x: _adjust_hue(x, fh),
                ],
                im,
            )

        return jax.lax.fori_loop(0, 4, step, img)

    jittered = jax.vmap(one)(images, fb, fc, fs, fh, perms)
    jittered = jnp.clip(jittered, 0.0, 255.0)
    return jnp.where(apply[:, None, None, None], jittered, images)


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
    return jnp.clip(images + shift, 0.0, 255.0)


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
    h = (hsv[..., 0] + dh / 180.0) % 1.0
    s = jnp.clip(hsv[..., 1] + dsat / 255.0, 0.0, 1.0)
    v = jnp.clip(hsv[..., 2] + dval, 0.0, 255.0)
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
