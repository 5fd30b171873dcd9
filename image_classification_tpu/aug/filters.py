"""Noise and blur: OneOf{GaussNoise, GaussianBlur, MotionBlur} p=0.3
(`dataset.py:201-205`).

TPU-native formulation: the two blur variants and the identity are all
expressed as a single per-sample KxK depthwise convolution whose kernel is a
delta (no blur), a truncated Gaussian (variable ksize in {3,5,7}, sigma from
OpenCV's ksize rule), or a random-direction motion line. One conv covers the
whole batch via the feature-group trick (reshape (B,H,W,C) -> a single conv
with B*C groups), so the branchless SPMD step has no per-sample control flow.
Gaussian noise adds per-pixel N(0, sigma), sigma^2 ~ U(var_limit).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

MAX_K = 7  # kernels padded to 7x7 (blur_limit upper bound in the reference)


class NoiseBlurCfg(NamedTuple):
    prob: float = 0.3
    gauss_noise_var: tuple[float, float] = (10.0, 50.0)
    blur_limit: tuple[int, int] = (3, 7)


def _delta_kernel(batch: int) -> jnp.ndarray:
    k = jnp.zeros((batch, MAX_K, MAX_K))
    return k.at[:, MAX_K // 2, MAX_K // 2].set(1.0)


# OpenCV's fixed "small gaussian" 1-D kernels used for ksize<=7 with sigma=0,
# zero-padded to MAX_K (cv2.getGaussianKernel small_gaussian_tab).
_CV2_SMALL_GAUSSIANS = jnp.array(
    [
        [0.0, 0.0, 0.25, 0.5, 0.25, 0.0, 0.0],                       # k=3
        [0.0, 0.0625, 0.25, 0.375, 0.25, 0.0625, 0.0],               # k=5
        [0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125],  # k=7
    ],
    dtype=jnp.float32,
)


def gaussian_kernels(ksizes: jnp.ndarray) -> jnp.ndarray:
    """(B,) odd sizes in {3,5,7} -> (B, 7, 7) kernels identical to
    cv2.GaussianBlur(ksize, sigma=0), which uses fixed binomial-style
    kernels for these sizes."""
    idx = jnp.clip((ksizes - 3) // 2, 0, 2)
    g1 = _CV2_SMALL_GAUSSIANS[idx]
    return g1[:, :, None] * g1[:, None, :]


def motion_kernels(key: jax.Array, ksizes: jnp.ndarray) -> jnp.ndarray:
    """(B,) odd sizes -> (B, 7, 7) random-direction line kernels
    (`dataset.py:204` MotionBlur): a 1px-wide line of length k through the
    kernel center at angle U(0, pi), anti-aliased, normalized."""
    B = ksizes.shape[0]
    theta = jax.random.uniform(key, (B, 1, 1), maxval=jnp.pi)
    c = MAX_K // 2
    ys = jax.lax.broadcasted_iota(jnp.float32, (MAX_K, MAX_K), 0)[None] - c
    xs = jax.lax.broadcasted_iota(jnp.float32, (MAX_K, MAX_K), 1)[None] - c
    dx, dy = jnp.cos(theta), jnp.sin(theta)
    # distance from pixel center to the line through origin with direction d
    perp = jnp.abs(xs * dy - ys * dx)
    along = jnp.abs(xs * dx + ys * dy)
    half = ((ksizes - 1) // 2).astype(jnp.float32)[:, None, None]
    w = jnp.clip(1.0 - perp, 0.0, 1.0) * (along <= half + 0.5)
    return w / jnp.sum(w, axis=(1, 2), keepdims=True)


def depthwise_conv_per_sample(
    images: jnp.ndarray, kernels: jnp.ndarray
) -> jnp.ndarray:
    """Convolve each sample with its own KxK kernel (all channels alike).
    images (B,H,W,C) f32, kernels (B,K,K). Reflect-101 edge padding.

    Written as K*K shifted fused multiply-adds with per-sample scalar
    weights — fully batched VPU work. (The grouped-conv formulation with
    B*C groups lowers to a sequential per-group loop on TPU.)
    """
    B, H, W, C = images.shape
    K = kernels.shape[-1]
    pad = K // 2
    x = jnp.pad(
        images, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect"
    )
    kernels = kernels.astype(images.dtype)
    out = jnp.zeros_like(images)
    for i in range(K):
        for j in range(K):
            w = kernels[:, i, j][:, None, None, None]
            out = out + x[:, i : i + H, j : j + W, :] * w
    return out


def noise_blur_oneof(
    images: jnp.ndarray, key: jax.Array, cfg: NoiseBlurCfg
) -> jnp.ndarray:
    B = images.shape[0]
    k_apply, k_pick, k_var, k_noise, k_ks, k_mk = jax.random.split(key, 6)
    apply = jax.random.bernoulli(k_apply, cfg.prob, (B,))
    pick = jax.random.randint(k_pick, (B,), 0, 3)  # 0 noise, 1 gauss, 2 motion

    # --- noise branch
    var = jax.random.uniform(
        k_var, (B, 1, 1, 1),
        minval=cfg.gauss_noise_var[0], maxval=cfg.gauss_noise_var[1],
    )
    noise = (jax.random.normal(k_noise, images.shape) * jnp.sqrt(var)).astype(
        images.dtype
    )
    use_noise = apply & (pick == 0)
    noised = jnp.where(use_noise[:, None, None, None], images + noise, images)

    # --- blur branches (single fused conv; delta kernel = no-op)
    lo, hi = cfg.blur_limit
    n_odd = (hi - lo) // 2 + 1
    ksizes = lo + 2 * jax.random.randint(k_ks, (B,), 0, n_odd)
    gk = gaussian_kernels(ksizes)
    mk = motion_kernels(k_mk, ksizes)
    dk = _delta_kernel(B)
    use_gauss = (apply & (pick == 1))[:, None, None]
    use_motion = (apply & (pick == 2))[:, None, None]
    kernel = jnp.where(use_gauss, gk, jnp.where(use_motion, mk, dk))
    out = depthwise_conv_per_sample(noised, kernel)
    return jnp.clip(out, 0.0, 255.0)
