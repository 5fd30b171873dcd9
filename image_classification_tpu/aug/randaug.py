"""Device-side RandAugment (timm 'rand-m9-n3-mstd0.5' semantics).

The reference's V2 applied timm's ``rand_augment_transform('rand-m9-n3-mstd0.5')``
to the PIL image with p=0.3 before the albumentations chain
(`previous/V2-convbase/dataset.py:51-54,181-183`). This is the batched,
PRNG-keyed equivalent: per sample, ``num_ops`` ops drawn uniformly from the
standard 15-op set, each applied with probability 0.5 at magnitude
~ N(m, mstd) clamped to [0, 10].

All ops run on float32 images in [0, 255]. Geometric ops use the shared
reflect-101 bilinear warp. Histogram ops (equalize) use a 256-bin one-hot
matmul — TPU-friendly, no data-dependent shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from image_classification_tpu.aug.color import (
    _adjust_brightness,
    _adjust_contrast,
    _adjust_saturation,
)
from image_classification_tpu.aug.geometry import bilinear_gather, output_grid


class RandAugmentCfg(NamedTuple):
    prob: float = 0.3       # gate for the whole RandAugment block (V2 recipe)
    num_ops: int = 3        # n3
    magnitude: float = 9.0  # m9
    mag_std: float = 0.5    # mstd0.5


_NUM_OPS = 15  # timm _RAND_TRANSFORMS order (indices documented per-branch)


def _affine_warp_single(img: jnp.ndarray, mat: jnp.ndarray) -> jnp.ndarray:
    """img (H, W, 3); mat 3x3 mapping output->source [x, y, 1]."""
    H, W, _ = img.shape
    grid = output_grid(H, W)
    homog = jnp.concatenate([grid, jnp.ones_like(grid[..., :1])], axis=-1)
    src = jnp.einsum("ij,hwj->hwi", mat, homog)
    coords = jnp.stack([src[..., 1], src[..., 0]], axis=-1)
    return bilinear_gather(img[None], coords[None])[0]


def _rotate(img, deg):
    H, W, _ = img.shape
    cx, cy = (W - 1) / 2.0, (H - 1) / 2.0
    t = jnp.deg2rad(deg)
    c, s = jnp.cos(t), jnp.sin(t)
    # inverse rotation about center
    mat = jnp.array(
        [[1, 0, 0], [0, 1, 0], [0, 0, 1]], jnp.float32
    )
    mat = mat.at[0, 0].set(c).at[0, 1].set(s).at[1, 0].set(-s).at[1, 1].set(c)
    mat = mat.at[0, 2].set(cx - c * cx - s * cy).at[1, 2].set(cy + s * cx - c * cy)
    return _affine_warp_single(img, mat)


def _shear(img, amount, axis):
    mat = jnp.eye(3, dtype=jnp.float32)
    if axis == 0:
        mat = mat.at[0, 1].set(amount)
    else:
        mat = mat.at[1, 0].set(amount)
    return _affine_warp_single(img, mat)


def _translate(img, frac, axis):
    H, W, _ = img.shape
    mat = jnp.eye(3, dtype=jnp.float32)
    if axis == 0:
        mat = mat.at[0, 2].set(frac * W)
    else:
        mat = mat.at[1, 2].set(frac * H)
    return _affine_warp_single(img, mat)


def _autocontrast(img):
    lo = jnp.min(img, axis=(0, 1), keepdims=True)
    hi = jnp.max(img, axis=(0, 1), keepdims=True)
    scale = 255.0 / jnp.maximum(hi - lo, 1e-5)
    out = (img - lo) * scale
    return jnp.where(hi > lo, out, img)


def _equalize(img):
    """Per-channel histogram equalization (PIL semantics approximated)."""

    def eq_channel(ch):
        vals = jnp.clip(ch, 0, 255).astype(jnp.int32)
        onehot = jax.nn.one_hot(vals.reshape(-1), 256, dtype=jnp.float32)
        hist = onehot.sum(axis=0)
        cdf = jnp.cumsum(hist)
        # PIL: step = (total - last_nonzero_bin) // 255
        nz_mask = hist > 0
        total = cdf[-1]
        step = (total - hist[255]) / 255.0
        lut = jnp.where(
            step > 0, jnp.clip((cdf - hist / 2.0) / jnp.maximum(step, 1e-6), 0, 255),
            jnp.arange(256, dtype=jnp.float32),
        )
        return lut[vals]

    out = jnp.stack([eq_channel(img[..., c]) for c in range(3)], axis=-1)
    return out.astype(img.dtype if jnp.issubdtype(img.dtype, jnp.floating)
                      else jnp.float32)


def _invert(img):
    return 255.0 - img


def _posterize(img, bits):
    """Keep the top ``bits`` bits (bits in [0, 8])."""
    shift = jnp.clip(8 - bits, 0, 8).astype(jnp.int32)
    vals = jnp.clip(img, 0, 255).astype(jnp.int32)
    out = jnp.left_shift(jnp.right_shift(vals, shift), shift)
    return out.astype(img.dtype if jnp.issubdtype(img.dtype, jnp.floating)
                      else jnp.float32)


def _solarize(img, threshold):
    return jnp.where(img >= threshold, 255.0 - img, img)


def _solarize_add(img, add):
    return jnp.where(img < 128.0, jnp.clip(img + add, 0, 255), img)


def _sharpness(img, factor):
    """PIL SMOOTH-kernel blend: out = blur + factor * (img - blur)."""
    k = (jnp.array([[1, 1, 1], [1, 5, 1], [1, 1, 1]], jnp.float32) / 13.0).astype(
        img.dtype
    )
    pad = jnp.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
    blur = jax.lax.conv_general_dilated(
        pad.transpose(2, 0, 1)[None],
        jnp.broadcast_to(k, (3, 1, 3, 3)).reshape(3, 1, 3, 3),
        (1, 1), "VALID", feature_group_count=3,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0].transpose(1, 2, 0)
    return blur + factor * (img - blur)


def rand_augment(
    images: jnp.ndarray, key: jax.Array, cfg: RandAugmentCfg
) -> jnp.ndarray:
    """images (B, H, W, 3) float32 0..255 -> augmented, same shape.

    SPMD formulation: per op slot, every branch is computed *batched* over
    the whole batch and per-sample selected by the drawn op id (per-sample
    vmap(switch) serializes on TPU; see aug/color.py for the same pattern).
    """
    B = images.shape[0]
    k_gate, k_ops, k_apply, k_mag, k_sign = jax.random.split(key, 5)
    gate = jax.random.bernoulli(k_gate, cfg.prob, (B,))
    op_ids = jax.random.randint(k_ops, (B, cfg.num_ops), 0, _NUM_OPS)
    applies = jax.random.bernoulli(k_apply, 0.5, (B, cfg.num_ops))
    mags = jnp.clip(
        cfg.magnitude
        + cfg.mag_std * jax.random.normal(k_mag, (B, cfg.num_ops)),
        0.0, 10.0,
    )
    signs = jax.random.bernoulli(k_sign, 0.5, (B, cfg.num_ops))

    x = images
    for slot in range(cfg.num_ops):
        mag = mags[:, slot]
        sign = signs[:, slot]
        frac = mag / 10.0
        signed = jnp.where(sign, frac, -frac)
        b1 = signed[:, None, None, None]

        def warp(fn, *args):
            return jax.vmap(fn)(x, *args)

        branches = [
            jax.vmap(_autocontrast)(x),                                  # 0
            jax.vmap(_equalize)(x),                                      # 1
            _invert(x),                                                  # 2
            warp(_rotate, signed * 30.0),                                # 3
            _posterize(x, (4 - jnp.floor(frac * 4))[:, None, None, None]),  # 4
            _solarize(x, (256.0 * (1 - frac))[:, None, None, None]),     # 5
            _solarize_add(x, (110.0 * frac)[:, None, None, None]),       # 6
            jnp.clip(_adjust_saturation(x, 1.0 + b1 * 0.9), 0, 255),     # 7
            jnp.clip(_adjust_contrast(x, 1.0 + b1 * 0.9), 0, 255),       # 8
            jnp.clip(_adjust_brightness(x, 1.0 + b1 * 0.9), 0, 255),     # 9
            jnp.clip(jax.vmap(_sharpness)(x, 1.0 + signed * 0.9), 0, 255),  # 10
            warp(lambda im, a: _shear(im, a, 0), signed * 0.3),          # 11
            warp(lambda im, a: _shear(im, a, 1), signed * 0.3),          # 12
            warp(lambda im, a: _translate(im, a, 0), signed * 0.45),     # 13
            warp(lambda im, a: _translate(im, a, 1), signed * 0.45),     # 14
        ]
        op = op_ids[:, slot][:, None, None, None]
        out = branches[0]
        for i in range(1, _NUM_OPS):
            out = jnp.where(op == i, branches[i], out)
        x = jnp.where((applies[:, slot] & gate)[:, None, None, None], out, x)
    return x
