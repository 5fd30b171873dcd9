"""Pallas TPU kernel: fused bilinear warp for the augmentation pipeline.

The XLA formulation (aug/geometry.bilinear_gather_mxu) is two contractions
with a (B, P, W*C) intermediate that streams through HBM (~1 GB per batch in
f32, the warp's dominant cost). This kernel runs both contractions per
output-pixel chunk entirely in VMEM:

    per (b, chunk):  hat_y (PC, H) @ img_c (H, W) -> tmp_c (PC, W)   [MXU]
                     out_c = sum_w hat_x * tmp_c                     [VPU]

Coordinates are folded (reflect-101) and hats built in-kernel from iota —
no gathers, no dynamic indexing, all static shapes. The warp is forward-only
data augmentation, so no VJP is needed.

Layout choices: channels are a static python loop (C=3); the output is
(B, C, P) so the pixel chunk sits on the lane dimension; XLA transposes it
back to NHWC outside (cheap relative to the saved HBM traffic).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from image_classification_tpu.ops.dwconv import pallas_available

PC = 2048  # output pixels per grid step (lane-dim multiple of 128)


def _warp_kernel(img_ref, y_ref, x_ref, out_ref):
    """img (1, C, H, W); y/x (1, 1, PC) folded coords; out (1, C, PC)."""
    _, C, H, W = img_ref.shape
    y = y_ref[0, 0]  # (PC,) f32, already folded into [0, H-1]
    x = x_ref[0, 0]
    dt = img_ref.dtype
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (PC, H), 1).astype(jnp.float32)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (PC, W), 1).astype(jnp.float32)
    hat_y = jnp.maximum(0.0, 1.0 - jnp.abs(y[:, None] - iota_h)).astype(dt)
    hat_x = jnp.maximum(0.0, 1.0 - jnp.abs(x[:, None] - iota_w)).astype(dt)
    for c in range(C):
        tmp = jax.lax.dot_general(
            hat_y, img_ref[0, c, :, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (PC, W) f32 — never leaves VMEM
        out_c = jnp.sum(hat_x.astype(jnp.float32) * tmp, axis=1)
        out_ref[0, c, :] = out_c.astype(out_ref.dtype)


def warp_pallas(
    img: jnp.ndarray, coords_yx: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """img (B, H, W, C) float; coords (B, Ho, Wo, 2) [y, x] float (unfolded).
    Returns (B, Ho, Wo, C). Reflect-101 border folding happens here."""
    from image_classification_tpu.aug.geometry import reflect101_coord

    B, H, W, C = img.shape
    Ho, Wo = coords_yx.shape[1:3]
    P = Ho * Wo
    n_chunks = -(-P // PC)
    P_pad = n_chunks * PC
    y = reflect101_coord(coords_yx[..., 0].reshape(B, P), H).astype(jnp.float32)
    x = reflect101_coord(coords_yx[..., 1].reshape(B, P), W).astype(jnp.float32)
    if P_pad != P:
        pad = ((0, 0), (0, P_pad - P))
        y = jnp.pad(y, pad)
        x = jnp.pad(x, pad)
    # (B, 1, P_pad): Mosaic requires block dims to divide (8, 128) or equal
    # the full array dim — the singleton middle dim satisfies that.
    y = y[:, None, :]
    x = x[:, None, :]
    img_t = img.transpose(0, 3, 1, 2)  # (B, C, H, W)

    out = pl.pallas_call(
        _warp_kernel,
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec((1, C, H, W), lambda b, p: (b, 0, 0, 0)),
            pl.BlockSpec((1, 1, PC), lambda b, p: (b, 0, p)),
            pl.BlockSpec((1, 1, PC), lambda b, p: (b, 0, p)),
        ],
        out_specs=pl.BlockSpec((1, C, PC), lambda b, p: (b, 0, p)),
        out_shape=jax.ShapeDtypeStruct((B, C, P_pad), img.dtype),
        interpret=interpret,
    )(img_t, y, x)
    out = out[:, :, :P].transpose(0, 2, 1)
    return out.reshape(B, Ho, Wo, C)


def warp_pallas_available(img_shape: tuple[int, ...]) -> bool:
    if os.environ.get("IC_TPU_NO_PALLAS"):
        return False
    B, H, W, C = img_shape
    # one image must fit in VMEM alongside the chunk workspaces
    return pallas_available() and C <= 4 and H * W <= 128 * 128
