"""Geometric augmentation as one fused batched warp.

The reference runs RandomResizedCrop -> H/V flip -> ShiftScaleRotate ->
{optical | grid | elastic} distortion as separate OpenCV remaps per sample in
CPU worker processes (`dataset.py:196-210`). Every one of those is a
coordinate transform, so the TPU-native design composes them *symbolically*
into a single per-sample map

    src(p) = A @ (p + d(p)),   A = RRC . flip . SSR^-1   (3x3 affine)

and performs ONE batched bilinear gather from the native-resolution image
with reflect-101 border folding. One resampling instead of four means less
memory traffic and better interpolation quality.

Intentional, documented deviations from albumentations semantics (all well
inside the +-0.3pt parity budget; see tests/test_aug_geometry.py goldens):
- border reflection happens in native-image space rather than per-stage;
- crop offsets are continuous rather than integer;
- the distortion field composes before the noise/blur stage instead of after
  (the reference applied blur before distortion).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------
# sampling primitives
# --------------------------------------------------------------------------

def reflect101_index(idx: jnp.ndarray, n: int) -> jnp.ndarray:
    """Fold integer indices into [0, n-1] with OpenCV BORDER_REFLECT_101
    semantics (edge pixel not repeated): ... 2 1 | 0 1 2 ... n-1 | n-2 n-3"""
    if n == 1:
        return jnp.zeros_like(idx)
    period = 2 * n - 2
    m = jnp.mod(idx, period)
    return jnp.where(m > n - 1, period - m, m)


def bilinear_gather(img: jnp.ndarray, coords_yx: jnp.ndarray) -> jnp.ndarray:
    """Sample ``img`` (B, H, W, C) at float coords (B, Ho, Wo, 2) [y, x]
    with bilinear interpolation and reflect-101 borders."""
    B, H, W, C = img.shape
    Ho, Wo = coords_yx.shape[1:3]
    y = coords_yx[..., 0]
    x = coords_yx[..., 1]
    wdt = img.dtype if jnp.issubdtype(img.dtype, jnp.floating) else jnp.float32
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    wy = (y - y0)[..., None].astype(wdt)
    wx = (x - x0)[..., None].astype(wdt)
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    flat_img = img.reshape(B, H * W, C)

    def tap(yi: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
        yi = reflect101_index(yi, H)
        xi = reflect101_index(xi, W)
        flat = (yi * W + xi).reshape(B, Ho * Wo, 1)
        return jnp.take_along_axis(flat_img, flat, axis=1).reshape(B, Ho, Wo, C)

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def reflect101_coord(coord: jnp.ndarray, n: int) -> jnp.ndarray:
    """Fold *float* coordinates with reflect-101 semantics. Reflection is
    affine within each unit cell, so folding the float coordinate and then
    interpolating equals interpolating with integer-tap folding."""
    if n == 1:
        return jnp.zeros_like(coord)
    period = 2 * n - 2
    m = jnp.mod(coord, period)
    return jnp.where(m > n - 1, period - m, m)


def bilinear_gather_mxu(img: jnp.ndarray, coords_yx: jnp.ndarray) -> jnp.ndarray:
    """Bilinear warp as two MXU contractions instead of a gather.

    TPU gathers execute near-serially (~60 ms for a 32x260x260 warp); the
    same bilinear sample is exactly

        out[p] = sum_h sum_w hat(y_p - h) * hat(x_p - w) * img[h, w]

    where ``hat`` is the 2-wide triangle kernel. Contracting over h first is
    a (P, H) x (H, W*C) matmul; the x-hats then reduce over w on the VPU.
    The hat weights are nonzero only at the two bilinear taps, so this is
    bit-for-bit the 4-tap bilinear result — on the MXU, where dense work is
    effectively free at these sizes. Used when the source image is small
    (the decode-native 60x80 images); falls back to the gather otherwise.
    """
    B, H, W, C = img.shape
    Ho, Wo = coords_yx.shape[1:3]
    P = Ho * Wo
    y = reflect101_coord(coords_yx[..., 0].reshape(B, P), H)
    x = reflect101_coord(coords_yx[..., 1].reshape(B, P), W)
    dt = img.dtype if jnp.issubdtype(img.dtype, jnp.floating) else jnp.float32
    hi = jnp.arange(H, dtype=jnp.float32)
    wi = jnp.arange(W, dtype=jnp.float32)
    # hats in the image dtype (bf16 halves the dominant HBM traffic; weights
    # are exact at 0/1 so identity warps stay exact)
    hat_y = jnp.maximum(0.0, 1.0 - jnp.abs(y[..., None] - hi)).astype(dt)
    imgf = img.astype(dt).reshape(B, H, W * C)
    tmp = jax.lax.dot_general(
        hat_y, imgf,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dt)                                                     # (B,P,W*C)
    tmp = tmp.reshape(B, P, W, C)
    hat_x = jnp.maximum(0.0, 1.0 - jnp.abs(x[..., None] - wi)).astype(dt)
    out = jnp.sum(hat_x[..., None] * tmp, axis=2)                   # (B,P,C)
    return out.reshape(B, Ho, Wo, C)


def bilinear_gather_mxu_xfirst(
    img: jnp.ndarray, coords_yx: jnp.ndarray
) -> jnp.ndarray:
    """``bilinear_gather_mxu`` with the contraction order swapped: x-hats
    on the MXU first, y-hats reduced on the VPU. The (B, P, H*C)
    intermediate is H*C/W*C the size of the y-first form's (25% less HBM
    write+read traffic for the 60x80 natives, where H*C=180 < W*C=240).
    Same 4-tap bilinear result bit-for-bit."""
    B, H, W, C = img.shape
    Ho, Wo = coords_yx.shape[1:3]
    P = Ho * Wo
    y = reflect101_coord(coords_yx[..., 0].reshape(B, P), H)
    x = reflect101_coord(coords_yx[..., 1].reshape(B, P), W)
    dt = img.dtype if jnp.issubdtype(img.dtype, jnp.floating) else jnp.float32
    hi = jnp.arange(H, dtype=jnp.float32)
    wi = jnp.arange(W, dtype=jnp.float32)
    hat_x = jnp.maximum(0.0, 1.0 - jnp.abs(x[..., None] - wi)).astype(dt)
    # (B, W, H*C) view of the source — a tiny transpose (~1 MB at batch 32)
    imgf = img.astype(dt).transpose(0, 2, 1, 3).reshape(B, W, H * C)
    tmp = jax.lax.dot_general(
        hat_x, imgf,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dt)                                                     # (B,P,H*C)
    tmp = tmp.reshape(B, P, H, C)
    hat_y = jnp.maximum(0.0, 1.0 - jnp.abs(y[..., None] - hi)).astype(dt)
    out = jnp.sum(hat_y[..., None] * tmp, axis=2)                   # (B,P,C)
    return out.reshape(B, Ho, Wo, C)


# Source images up to this many pixels use the MXU formulation; beyond it
# the dense (P, H*?) work and hat tensors outgrow the gather's cost.
_MXU_WARP_MAX_SRC_PIXELS = 128 * 128


def sample_image(
    img: jnp.ndarray, coords_yx: jnp.ndarray, impl: str = "xla", shard_mesh=None
) -> jnp.ndarray:
    """Dispatch bilinear sampling to the MXU formulation for small source
    images (the hot path: native 60x80 decode size) or the generic gather.
    The MXU form contracts the longer source axis first so the HBM-resident
    (B, P, rest) intermediate — the formulation's dominant traffic — is as
    small as possible. ``impl="pallas"`` routes to the fused VMEM-resident
    kernel (ops/warp.py) when available on this backend; with ``shard_mesh``
    set (data-parallel-only meshes) the kernel runs per-shard under
    jax.shard_map instead of demoting to the XLA form."""
    B, H, W, C = img.shape
    if impl == "pallas":
        from image_classification_tpu.ops.warp import (
            interpret_forced,
            warp_pallas,
            warp_pallas_available,
            warp_pallas_sharded,
        )

        if warp_pallas_available(img.shape):
            if (
                shard_mesh is not None
                and B % shard_mesh.shape["data"] == 0
            ):
                return warp_pallas_sharded(img, coords_yx, shard_mesh)
            if shard_mesh is None:
                return warp_pallas(img, coords_yx, interpret=interpret_forced())
            # mesh present but rows not shardable (e.g. trace-time batch 1):
            # fall through to the XLA form, which GSPMD handles.
    if H * W <= _MXU_WARP_MAX_SRC_PIXELS:
        if H <= W:
            return bilinear_gather_mxu_xfirst(img, coords_yx)
        return bilinear_gather_mxu(img, coords_yx)
    return bilinear_gather(img, coords_yx)


def output_grid(h: int, w: int) -> jnp.ndarray:
    """(h, w, 2) [x, y] pixel-center coordinates."""
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    return jnp.stack([xs, ys], axis=-1)


# --------------------------------------------------------------------------
# per-stage affine factors (all matrices act on [x, y, 1] homogeneous coords)
# --------------------------------------------------------------------------

def random_resized_crop_matrix(
    key: jax.Array,
    batch: int,
    native_hw: tuple[int, int],
    out_hw: tuple[int, int],
    scale: tuple[float, float],
    ratio: tuple[float, float],
    n_attempts: int = 10,
) -> jnp.ndarray:
    """Per-sample affine mapping output pixel coords -> native crop coords.

    Samples albumentations/torchvision RandomResizedCrop geometry
    (`dataset.py:197`): area fraction ~ U(scale), aspect ~ exp(U(log ratio)),
    first of ``n_attempts`` candidates that fits wins, else the fallback crop
    (largest centered crop with clamped aspect).
    """
    H, W = native_hw
    Ho, Wo = out_hw
    k_area, k_ratio, k_x, k_y = jax.random.split(key, 4)
    area = jax.random.uniform(
        k_area, (batch, n_attempts), minval=scale[0], maxval=scale[1]
    ) * (H * W)
    log_r = jax.random.uniform(
        k_ratio,
        (batch, n_attempts),
        minval=jnp.log(ratio[0]),
        maxval=jnp.log(ratio[1]),
    )
    r = jnp.exp(log_r)
    w = jnp.sqrt(area * r)
    h = jnp.sqrt(area / r)
    ok = (w <= W) & (h <= H)
    # index of first valid attempt (argmax returns first True)
    first = jnp.argmax(ok, axis=1)
    any_ok = ok.any(axis=1)
    w = jnp.take_along_axis(w, first[:, None], axis=1)[:, 0]
    h = jnp.take_along_axis(h, first[:, None], axis=1)[:, 0]
    # fallback: clamp aspect to feasible box, centered
    in_ratio = W / H
    fb_w = jnp.where(in_ratio < ratio[0], W, jnp.where(in_ratio > ratio[1], H * ratio[1], W))
    fb_h = jnp.where(in_ratio < ratio[0], W / ratio[0], jnp.where(in_ratio > ratio[1], H, H))
    w = jnp.where(any_ok, w, fb_w)
    h = jnp.where(any_ok, h, fb_h)
    ux = jax.random.uniform(k_x, (batch,))
    uy = jax.random.uniform(k_y, (batch,))
    x0 = ux * (W - w)
    y0 = uy * (H - h)
    x0 = jnp.where(any_ok, x0, (W - w) / 2)
    y0 = jnp.where(any_ok, y0, (H - h) / 2)
    sx = w / Wo
    sy = h / Ho
    # src = x0 + (dst + 0.5) * s - 0.5   (half-pixel-center convention)
    zeros = jnp.zeros_like(sx)
    ones = jnp.ones_like(sx)
    mat = jnp.stack(
        [
            jnp.stack([sx, zeros, x0 + 0.5 * sx - 0.5], axis=-1),
            jnp.stack([zeros, sy, y0 + 0.5 * sy - 0.5], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )
    return mat  # (B, 3, 3)


def flip_matrix(
    key: jax.Array,
    batch: int,
    out_hw: tuple[int, int],
    hflip_prob: float,
    vflip_prob: float,
) -> jnp.ndarray:
    """Random horizontal/vertical flips in output space
    (`dataset.py:198-199`)."""
    Ho, Wo = out_hw
    kh, kv = jax.random.split(key)
    do_h = jax.random.bernoulli(kh, hflip_prob, (batch,))
    do_v = jax.random.bernoulli(kv, vflip_prob, (batch,))
    sx = jnp.where(do_h, -1.0, 1.0)
    sy = jnp.where(do_v, -1.0, 1.0)
    tx = jnp.where(do_h, float(Wo - 1), 0.0)
    ty = jnp.where(do_v, float(Ho - 1), 0.0)
    zeros = jnp.zeros_like(sx)
    ones = jnp.ones_like(sx)
    return jnp.stack(
        [
            jnp.stack([sx, zeros, tx], axis=-1),
            jnp.stack([zeros, sy, ty], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )


def ssr_forward_matrix(
    angle_deg: jnp.ndarray,
    scale: jnp.ndarray,
    dx: jnp.ndarray,
    dy: jnp.ndarray,
    out_hw: tuple[int, int],
) -> jnp.ndarray:
    """cv2.getRotationMatrix2D((W-1)/2,(H-1)/2, angle, scale) with an added
    (dx*W, dy*H) translation, as a batched 3x3 homogeneous matrix. This is
    albumentations ShiftScaleRotate's forward warp (`dataset.py:200`)."""
    Ho, Wo = out_hw
    theta = jnp.deg2rad(angle_deg)
    cx, cy = (Wo - 1) / 2.0, (Ho - 1) / 2.0
    a = scale * jnp.cos(theta)
    b = scale * jnp.sin(theta)
    tx = (1 - a) * cx - b * cy + dx * Wo
    ty = b * cx + (1 - a) * cy + dy * Ho
    zeros = jnp.zeros_like(a)
    ones = jnp.ones_like(a)
    return jnp.stack(
        [
            jnp.stack([a, b, tx], axis=-1),
            jnp.stack([-b, a, ty], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )


def shift_scale_rotate_inverse_matrix(
    key: jax.Array,
    batch: int,
    out_hw: tuple[int, int],
    prob: float,
    shift_limit: float,
    scale_limit: float,
    rotate_limit_deg: float,
) -> jnp.ndarray:
    """Inverse of albumentations ShiftScaleRotate's forward warp
    (`dataset.py:200`); output(p) = input(M^-1 p)."""
    k_apply, k_sh, k_sc, k_rot = jax.random.split(key, 4)
    apply = jax.random.bernoulli(k_apply, prob, (batch,))
    dxy = jax.random.uniform(
        k_sh, (batch, 2), minval=-shift_limit, maxval=shift_limit
    )
    scale = 1.0 + jax.random.uniform(
        k_sc, (batch,), minval=-scale_limit, maxval=scale_limit
    )
    angle = jax.random.uniform(
        k_rot, (batch,), minval=-rotate_limit_deg, maxval=rotate_limit_deg
    )
    scale = jnp.where(apply, scale, 1.0)
    angle = jnp.where(apply, angle, 0.0)
    dxy = jnp.where(apply[:, None], dxy, 0.0)
    fwd = ssr_forward_matrix(angle, scale, dxy[:, 0], dxy[:, 1], out_hw)
    return jnp.linalg.inv(fwd)


# --------------------------------------------------------------------------
# distortion displacement maps (sampled in output space)
# --------------------------------------------------------------------------

class DistortionCfg(NamedTuple):
    prob: float = 0.3
    optical_distort_limit: float = 0.1
    optical_shift_limit: float = 0.1
    grid_distort_limit: float = 0.1
    grid_num_steps: int = 5
    elastic_alpha: float = 1.0
    elastic_sigma: float = 50.0


def optical_distortion_map(
    key: jax.Array, batch: int, out_hw: tuple[int, int], cfg: DistortionCfg
) -> jnp.ndarray:
    """Barrel/pincushion distortion approximating cv2.initUndistortRectifyMap
    with distCoeffs=(k, k, 0, 0), fx=fy=W (`dataset.py:207`)."""
    Ho, Wo = out_hw
    k_k, k_s = jax.random.split(key)
    k = jax.random.uniform(
        k_k, (batch, 1, 1),
        minval=-cfg.optical_distort_limit, maxval=cfg.optical_distort_limit,
    )
    shift = jax.random.uniform(
        k_s, (batch, 2),
        minval=-cfg.optical_shift_limit, maxval=cfg.optical_shift_limit,
    )
    cx = Wo / 2.0 + shift[:, 0, None, None] * Wo
    cy = Ho / 2.0 + shift[:, 1, None, None] * Ho
    f = float(Wo)
    grid = output_grid(Ho, Wo)
    x = grid[None, ..., 0]
    y = grid[None, ..., 1]
    u = (x - cx) / f
    v = (y - cy) / f
    r2 = u * u + v * v
    factor = 1.0 + k * r2 + k * r2 * r2
    xs = u * factor * f + cx
    ys = v * factor * f + cy
    return jnp.stack([xs, ys], axis=-1)  # (B, Ho, Wo, 2) [x, y]


def grid_distortion_map(
    key: jax.Array, batch: int, out_hw: tuple[int, int], cfg: DistortionCfg
) -> jnp.ndarray:
    """Piecewise-linear, per-axis-separable grid distortion
    (`dataset.py:208`): each of ``num_steps`` cells along each axis has its
    width scaled by 1 + U(-limit, limit); boundaries renormalized to the full
    span; output coords map linearly within cells."""
    Ho, Wo = out_hw
    n = cfg.grid_num_steps
    kx, ky = jax.random.split(key)

    def axis_map(k: jax.Array, size: int) -> jnp.ndarray:
        widths = 1.0 + jax.random.uniform(
            k, (batch, n),
            minval=-cfg.grid_distort_limit, maxval=cfg.grid_distort_limit,
        )
        knots_out = jnp.concatenate(
            [jnp.zeros((batch, 1)), jnp.cumsum(widths, axis=1)], axis=1
        )
        knots_out = knots_out / knots_out[:, -1:] * (size - 1)  # distorted
        knots_in = jnp.linspace(0.0, size - 1, n + 1)  # uniform source knots
        coords = jnp.arange(size, dtype=jnp.float32)

        def interp_one(ko: jnp.ndarray) -> jnp.ndarray:
            return jnp.interp(coords, ko, knots_in)

        return jax.vmap(interp_one)(knots_out)  # (B, size)

    map_x = axis_map(kx, Wo)
    map_y = axis_map(ky, Ho)
    xs = jnp.broadcast_to(map_x[:, None, :], (batch, Ho, Wo))
    ys = jnp.broadcast_to(map_y[:, :, None], (batch, Ho, Wo))
    return jnp.stack([xs, ys], axis=-1)


def elastic_map(
    key: jax.Array, batch: int, out_hw: tuple[int, int], cfg: DistortionCfg
) -> jnp.ndarray:
    """Smooth random displacement field (`dataset.py:209`). With
    sigma >> 1 a Gaussian-filtered uniform field is spectrally equivalent to
    bilinear upsampling of a coarse noise grid with matched variance; we use
    that approximation (exact Gaussian filtering of a 260^2 field per sample
    buys nothing at alpha=1)."""
    Ho, Wo = out_hw
    sigma = max(cfg.elastic_sigma, 1.0)
    gh = max(2, int(Ho / sigma) + 2)
    gw = max(2, int(Wo / sigma) + 2)
    # Var of gaussian-filtered U(-1,1): Var(U) * 1/(4*pi*sigma^2) * (2*pi*sigma^2)…
    # net std ~ 1/(2*sqrt(pi)*sigma) * sqrt(Var(U)) per axis; matched below.
    std = (1.0 / 3.0) ** 0.5 / (2.0 * (jnp.pi ** 0.5) * sigma)
    coarse = jax.random.normal(key, (batch, gh, gw, 2)) * std * cfg.elastic_alpha
    disp = jax.image.resize(coarse, (batch, Ho, Wo, 2), method="linear")
    grid = output_grid(Ho, Wo)[None]
    return grid + disp


def distortion_source_map(
    key: jax.Array, batch: int, out_hw: tuple[int, int], cfg: DistortionCfg
) -> jnp.ndarray:
    """OneOf{optical, grid, elastic} with probability ``cfg.prob``
    (`dataset.py:206-210`), identity otherwise. Returns per-pixel source
    coords (B, Ho, Wo, 2) [x, y] in output space."""
    k_apply, k_pick, k_o, k_g, k_e = jax.random.split(key, 5)
    apply = jax.random.bernoulli(k_apply, cfg.prob, (batch,))
    pick = jax.random.randint(k_pick, (batch,), 0, 3)
    grid = jnp.broadcast_to(
        output_grid(*out_hw)[None], (batch, *out_hw, 2)
    )
    omap = optical_distortion_map(k_o, batch, out_hw, cfg)
    gmap = grid_distortion_map(k_g, batch, out_hw, cfg)
    emap = elastic_map(k_e, batch, out_hw, cfg)
    sel = jnp.where(
        (pick == 0)[:, None, None, None],
        omap,
        jnp.where((pick == 1)[:, None, None, None], gmap, emap),
    )
    return jnp.where(apply[:, None, None, None], sel, grid)


# --------------------------------------------------------------------------
# fused warp
# --------------------------------------------------------------------------

class GeometryCfg(NamedTuple):
    # "xla" = two-contraction MXU form with an HBM-resident (B, P, rest)
    # intermediate; "pallas" = fused ops/warp.py kernel (intermediate stays
    # in VMEM — kills the (B, P, H*C) relayout copy). Auto-falls back to
    # xla off-TPU or when the source image outgrows VMEM.
    warp_impl: str = "xla"
    rrc_scale: tuple[float, float] = (0.8, 1.0)
    rrc_ratio: tuple[float, float] = (0.75, 4.0 / 3.0)
    hflip_prob: float = 0.5
    vflip_prob: float = 0.5
    ssr_prob: float = 0.5
    shift_limit: float = 0.1
    scale_limit: float = 0.2
    rotate_limit: float = 30.0
    distortion: DistortionCfg = DistortionCfg()
    # Concrete Mesh on data-parallel-only runs: the Pallas warp runs
    # per-shard under jax.shard_map (ops/warp.py warp_pallas_sharded)
    # instead of demoting to the XLA form. None = direct call.
    shard_mesh: object = None


def geometric_augment(
    images: jnp.ndarray,
    key: jax.Array,
    out_hw: tuple[int, int],
    cfg: GeometryCfg,
) -> jnp.ndarray:
    """Fused RRC + flips + SSR + distortion: one gather per output pixel.

    ``images``: (B, H, W, C) float32 (0..255). Returns (B, Ho, Wo, C).
    """
    B, H, W, _ = images.shape
    k_rrc, k_flip, k_ssr, k_dist = jax.random.split(key, 4)
    A = random_resized_crop_matrix(
        k_rrc, B, (H, W), out_hw, cfg.rrc_scale, cfg.rrc_ratio
    )
    F = flip_matrix(k_flip, B, out_hw, cfg.hflip_prob, cfg.vflip_prob)
    Minv = shift_scale_rotate_inverse_matrix(
        k_ssr, B, out_hw, cfg.ssr_prob, cfg.shift_limit, cfg.scale_limit,
        cfg.rotate_limit,
    )
    T = jnp.einsum("bij,bjk,bkl->bil", A, F, Minv)  # (B, 3, 3)
    src_xy = distortion_source_map(k_dist, B, out_hw, cfg.distortion)
    homog = jnp.concatenate([src_xy, jnp.ones_like(src_xy[..., :1])], axis=-1)
    native_xy = jnp.einsum("bij,bhwj->bhwi", T, homog)
    coords_yx = jnp.stack([native_xy[..., 1], native_xy[..., 0]], axis=-1)
    return sample_image(
        images, coords_yx, impl=cfg.warp_impl, shard_mesh=cfg.shard_mesh
    )
