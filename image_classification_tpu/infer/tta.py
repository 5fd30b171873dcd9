"""Test-time augmentation views (device-side, batched).

``scale4`` reproduces `test_time_augmentation`
(`train_advanced_v4.py:317-347`): identity, horizontal flip, and two scale
views — resize to 0.9x/1.1x then torchvision CenterCrop back to the model
size, which zero-pads when the resized image is smaller than the crop.

``flip6`` reproduces the notebook pipeline's 6-way flip TTA
(`example.py:299-306`) verbatim — including its redundancy: views 5 and 6
duplicate the vertical and horizontal flips.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from image_classification_tpu.aug.pipeline import resize_bilinear


def center_crop_or_pad(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """torchvision CenterCrop: crop when larger, zero-pad when smaller."""
    B, H, W, C = x.shape
    Ho, Wo = out_hw
    # pad first (if needed), then crop
    ph, pw = max(0, Ho - H), max(0, Wo - W)
    if ph or pw:
        x = jnp.pad(
            x,
            (
                (0, 0),
                (ph // 2, ph - ph // 2),
                (pw // 2, pw - pw // 2),
                (0, 0),
            ),
        )
        B, H, W, C = x.shape
    y0 = (H - Ho) // 2
    x0 = (W - Wo) // 2
    return x[:, y0 : y0 + Ho, x0 : x0 + Wo]


def tta_views_scale4(x: jnp.ndarray) -> list[jnp.ndarray]:
    H, W = x.shape[1:3]
    views = [x, x[:, :, ::-1]]
    for scale in (0.9, 1.1):
        sh, sw = int(H * scale), int(W * scale)
        scaled = resize_bilinear(x, (sh, sw))
        views.append(center_crop_or_pad(scaled, (H, W)))
    return views


def tta_views_flip6(x: jnp.ndarray) -> list[jnp.ndarray]:
    hf = x[:, :, ::-1]
    vf = x[:, ::-1]
    hv = x[:, ::-1, ::-1]
    return [x, hf, vf, hv, vf, hf]  # exact reference view list


def get_tta(cfg) -> Callable | None:
    """None when TTA disabled (`cfg.tta_transforms == 0`,
    `train_advanced_v4.py:365-368`)."""
    if cfg.tta_transforms <= 0:
        return None
    return tta_views_flip6 if cfg.tta_mode == "flip6" else tta_views_scale4
