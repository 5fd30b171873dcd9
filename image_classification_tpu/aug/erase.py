"""CoarseDropout / random erasing (`dataset.py:219-230`, `config.py:15`).

Per sample with probability p: n ~ U{min_holes..max_holes} rectangles, each
height ~ U{H/16..H/8} and width ~ U{W/16..W/8}, uniform positions, filled
with 0 — computed as a batched boolean mask (no data-dependent shapes)."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class EraseCfg(NamedTuple):
    prob: float = 0.3
    max_holes: int = 8
    min_holes: int = 1
    fill_value: float = 0.0


def coarse_dropout(
    images: jnp.ndarray, key: jax.Array, cfg: EraseCfg
) -> jnp.ndarray:
    B, H, W, _ = images.shape
    max_h, min_h = H // 8, H // 16
    max_w, min_w = W // 8, W // 16
    k_apply, k_n, k_h, k_w, k_y, k_x = jax.random.split(key, 6)
    apply = jax.random.bernoulli(k_apply, cfg.prob, (B,))
    n = jax.random.randint(k_n, (B,), cfg.min_holes, cfg.max_holes + 1)
    M = cfg.max_holes
    hh = jax.random.randint(k_h, (B, M), min_h, max_h + 1)
    ww = jax.random.randint(k_w, (B, M), min_w, max_w + 1)
    y0 = (jax.random.uniform(k_y, (B, M)) * (H - hh)).astype(jnp.int32)
    x0 = (jax.random.uniform(k_x, (B, M)) * (W - ww)).astype(jnp.int32)
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    # (B, M, H, W) membership, masked by hole index < n
    in_y = (ys[None, None] >= y0[:, :, None, None]) & (
        ys[None, None] < (y0 + hh)[:, :, None, None]
    )
    in_x = (xs[None, None] >= x0[:, :, None, None]) & (
        xs[None, None] < (x0 + ww)[:, :, None, None]
    )
    active = (jnp.arange(M)[None, :] < n[:, None])[:, :, None, None]
    hole = jnp.any(in_y & in_x & active, axis=1)  # (B, H, W)
    hole = hole & apply[:, None, None]
    return jnp.where(hole[..., None], cfg.fill_value, images)
