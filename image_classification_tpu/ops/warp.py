"""Pallas TPU kernel: fused bilinear warp for the augmentation pipeline.

The XLA formulation (aug/geometry.bilinear_gather_mxu) is two contractions
with a (B, P, W*C) intermediate that streams through HBM (~0.5-1 GB per
batch, the warp's dominant cost). This kernel runs both contractions per
output-pixel chunk entirely in VMEM, contracting **W first** so the one
matmul per chunk is lane-aligned:

    img is pre-arranged (B, W, C*Hp) with per-channel slabs of H padded to
    a multiple of 128 lanes (Hp).  Per (b, chunk):

        hat_x (PC, W) @ img_b (W, C*Hp) -> tmp (PC, C*Hp)     [MXU, one dot]
        out[:, c] = sum_h hat_y (PC, Hp) * tmp[:, c*Hp:(c+1)*Hp]   [VPU]

Compared to the earlier per-channel H-first variant (3 tiny matmuls per
chunk), this issues ONE (PC, 80) x (80, 192) matmul per chunk with K=W=80
and lane-aligned channel slabs -- H only appears in the cheap elementwise
reduce, so no H-windowing is needed.

Coordinates are folded (reflect-101) and hats built in-kernel from iota --
no gathers, no dynamic indexing, all static shapes. The warp is forward-only
data augmentation, so no VJP is needed.

Replaces the reference's albumentations/OpenCV geometric chain
(`dataset.py:196-238`), which runs per-sample in CPU worker processes.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from image_classification_tpu.ops.dwconv import pallas_available

PC = 2048  # output pixels per grid step (lane-dim multiple of 128)


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _warp_kernel(img_ref, y_ref, x_ref, out_ref, *, H: int, Hp: int):
    """img (1, W, C*Hp); y/x (1, 1, PC) folded coords; out (1, C, PC)."""
    _, W, CHp = img_ref.shape
    C = CHp // Hp
    y = y_ref[0, 0]  # (PC,) f32, already folded into [0, H-1]
    x = x_ref[0, 0]
    dt = img_ref.dtype
    # Mosaic's tpu.iota is integer-only; build in i32 then convert.
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (PC, W), 1).astype(jnp.float32)
    hat_x = jnp.maximum(0.0, 1.0 - jnp.abs(x[:, None] - iota_w)).astype(dt)
    tmp = jax.lax.dot_general(
        hat_x, img_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (PC, C*Hp) f32 -- never leaves VMEM
    # hat_y over the padded H slab: y <= H-1 < Hp, so padded taps are 0.
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (PC, Hp), 1).astype(jnp.float32)
    hat_y = jnp.maximum(0.0, 1.0 - jnp.abs(y[:, None] - iota_h))
    for c in range(C):
        slab = tmp[:, c * Hp:(c + 1) * Hp]
        out_ref[0, c, :] = jnp.sum(hat_y * slab, axis=1).astype(out_ref.dtype)


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
    Hp = _round_up(H, 128)
    y = reflect101_coord(coords_yx[..., 0].reshape(B, P), H).astype(jnp.float32)
    x = reflect101_coord(coords_yx[..., 1].reshape(B, P), W).astype(jnp.float32)
    if P_pad != P:
        pad = ((0, 0), (0, P_pad - P))
        y = jnp.pad(y, pad)
        x = jnp.pad(x, pad)
    # (B, 1, P_pad): Mosaic requires block dims to divide (8, 128) or equal
    # the full array dim -- the singleton middle dim satisfies that.
    y = y[:, None, :]
    x = x[:, None, :]
    # (B, H, W, C) -> (B, W, C, Hp) -> (B, W, C*Hp): lane-aligned channel
    # slabs (the source image is tiny, so this transpose is cheap)
    img_t = img.transpose(0, 2, 3, 1)
    img_t = jnp.pad(img_t, ((0, 0), (0, 0), (0, 0), (0, Hp - H)))
    img_t = img_t.reshape(B, W, C * Hp)

    out = pl.pallas_call(
        lambda ir, yr, xr, orf: _warp_kernel(ir, yr, xr, orf, H=H, Hp=Hp),
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec((1, W, C * Hp), lambda b, p: (b, 0, 0)),
            pl.BlockSpec((1, 1, PC), lambda b, p: (b, 0, p)),
            pl.BlockSpec((1, 1, PC), lambda b, p: (b, 0, p)),
        ],
        out_specs=pl.BlockSpec((1, C, PC), lambda b, p: (b, 0, p)),
        out_shape=jax.ShapeDtypeStruct((B, C, P_pad), img.dtype),
        interpret=interpret,
    )(img_t, y, x)
    out = out[:, :, :P].transpose(0, 2, 1)
    return out.reshape(B, Ho, Wo, C)


def interpret_forced() -> bool:
    """CPU-test hook: run the kernel in interpreter mode off-TPU (same
    contract as ops/block_mlp.py)."""
    return bool(os.environ.get("IC_TPU_WARP_INTERPRET"))


def warp_pallas_available(img_shape: tuple[int, ...]) -> bool:
    if os.environ.get("IC_TPU_NO_PALLAS"):
        return False
    B, H, W, C = img_shape
    if C > 4 or H * W > 128 * 128:
        # one image must fit in VMEM alongside the chunk workspaces
        return False
    return pallas_available() or interpret_forced()


def warp_pallas_sharded(
    img: jnp.ndarray, coords_yx: jnp.ndarray, mesh
) -> jnp.ndarray:
    """Data-parallel shard_map wrapper: batch rows sharded on the mesh's
    "data" axis, each shard runs the kernel on its local images. Bitwise
    identical to the single-device kernel (the warp is per-image
    independent; all randomness stays in the caller's coord computation,
    which GSPMD shards the normal way). Callers guarantee
    B % mesh.shape['data'] == 0 (check_batch_divisible upstream)."""
    from jax.sharding import PartitionSpec as P

    def _local(img_l, coords_l):
        return warp_pallas(img_l, coords_l, interpret=interpret_forced())

    return jax.shard_map(
        _local,
        mesh=mesh,
        in_specs=(P("data"), P("data")),
        out_specs=P("data"),
        check_vma=False,
    )(img, coords_yx)
