"""Pallas TPU kernel: 7x7 depthwise convolution (ConvNeXt's spatial mixer).

XLA lowers NHWC depthwise convs on TPU with channel-major activation
layouts (``{3,0,2,1}``): even with layout pins confining the damage, the
profile shows a ~4.9 ms/step relayout pair plus ~3.2 ms of pathological
``f32[7,7,1,C]`` wgrad fusions (docs/PERF_NOTES.md). A Pallas kernel
consumes/produces standard row-major tiles, so using it removes the
relayout pair entirely and lets us pick a sane ``(K*K, C)`` wgrad
accumulator.

Design (v2 — the round-1 per-image grid lost to grid-step overhead):

* grid over **batch tiles** (``bt`` images per step, sized per stage so the
  f32 accumulator + double-buffered blocks fit VMEM), full image per block;
* forward: 49-tap stencil as vector FMAs, ``fori_loop`` over kernel rows
  (keeps one live tap buffer), f32 accumulation like XLA's conv;
* backward: ONE fused kernel per batch tile producing ``dx`` (stencil with
  the spatially flipped filter) **and** accumulating ``dw`` across the
  sequential grid (init at step 0, += after) — ``x`` and ``g`` are read
  from HBM exactly once for the whole backward.

Falls back to lax.conv on non-TPU backends (tests run the kernel in
interpreter mode for correctness). Parity: same math as timm's
``nn.Conv2d(dim, dim, 7, padding=3, groups=dim)`` used by the reference's
``convnext_base`` (created at `train_advanced_v4.py:484-502`).

STATUS — measured alternate, NOT the default. In-graph A/B on ConvNeXt-B
fwd+bwd (tools/bench_dwconv_ab.py, batch 32, real TPU): lax.conv+pin_layout
69.77 ms/it vs this kernel 134.39 ms/it — the VPU stencil FMAs lose to
XLA's conv math by more than the ~8 ms/step of relayout + wgrad pathology
they avoid. ``dwconv_impl="conv"`` stays the default; the kernel is kept as
a correct, tested reference implementation (docs/PERF_NOTES.md round-2 log).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # CompilerParams only lowers on TPU; interpret-mode tests skip it
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

K = 7
PAD = K // 2

# Scoped-VMEM budget for choosing the batch tile, expressed against the
# conservative per-kernel estimators below. Calibrated on hardware: measured
# scoped allocations run 0.76-0.88x the estimate (bwd bt=4 @17x17x512:
# 17.17 MB real vs 22.5 MB estimated; in-graph bwd bt=2 @33x33x256:
# 16.02 MB real vs 18.3 MB estimated), so capping the ESTIMATE at the 16 MB
# hardware scoped limit keeps the real footprint at <=14.2 MB.
_VMEM_BUDGET = 16 * 1024 * 1024


def _compiler_params(interpret: bool):
    """Backstop: raise the mosaic scoped-VMEM limit to 2x the tile budget so
    a small estimator undercount degrades double-buffering instead of
    hard-failing the compile (observed: 16.21M real vs 16M default limit)."""
    if interpret or pltpu is None:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=2 * _VMEM_BUDGET)


def pallas_available() -> bool:
    if os.environ.get("IC_TPU_NO_PALLAS"):
        return False
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    return platform in ("tpu", "axon")


def _fwd_bytes_per_image(H: int, W: int, C: int) -> int:
    """Estimated scoped-VMEM bytes per batch-tile image in the fwd kernel:
    double-buffered bf16 in/out blocks + f32 accumulator + f32 tap temps."""
    center, padded = H * W * C, (H + 2 * PAD) * (W + 2 * PAD) * C
    return 8 * padded + 12 * center


def _bwd_bytes_per_image(H: int, W: int, C: int) -> int:
    """Same for the fused bwd kernel: double-buffered xc/gp/dx blocks + f32
    dx accumulator + f32 row-slice temps in both tap loops."""
    center, padded = H * W * C, (H + 2 * PAD) * (W + 2 * PAD) * C
    return 12 * padded + 16 * center


def _batch_tile(B: int, H: int, W: int, C: int, per_image: int) -> int:
    bt = 8
    while bt > 1 and bt * per_image > _VMEM_BUDGET:
        bt //= 2
    while B % bt:
        bt //= 2
    return max(bt, 1)


# --------------------------------------------------------------------------
# kernels
# --------------------------------------------------------------------------


def _fwd_kernel(x_ref, w_ref, out_ref):
    """x (bt, H+6, W+6, C), w (K, K, C) -> out (bt, H, W, C)."""
    bt, H, W, C = out_ref.shape

    def tap_row(i, acc):
        # dynamic offset on the second (row) dim is legal; the sublane (W)
        # dim only sees static offsets j
        xr = x_ref[:, pl.ds(i, H), :, :]
        for j in range(K):
            acc += xr[:, :, j : j + W, :].astype(jnp.float32) * w_ref[
                i, j, :
            ].astype(jnp.float32)
        return acc

    acc = jax.lax.fori_loop(
        0, K, tap_row, jnp.zeros((bt, H, W, C), jnp.float32)
    )
    out_ref[...] = acc.astype(out_ref.dtype)


def _bwd_kernel(xc_ref, gp_ref, w_ref, dx_ref, dw_ref):
    """Fused backward for one batch tile.

    xc (bt, H, W, C): the *center* (unpadded) input tile;
    gp (bt, H+6, W+6, C): zero-padded upstream gradient;
    w  (K, K, C).
    dx (bt, H, W, C) = corr(gp, flip(w)); dw (K, K, C) += per-tap reduce.
    dw accumulates across the sequential batch grid (init at step 0).
    """
    bt, H, W, C = dx_ref.shape
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    xc = xc_ref[...]

    def tap_row(i, acc):
        gr = gp_ref[:, pl.ds(i, H), :, :]
        for j in range(K):
            # dx: correlate g with the spatially flipped filter
            acc += gr[:, :, j : j + W, :].astype(jnp.float32) * w_ref[
                K - 1 - i, K - 1 - j, :
            ].astype(jnp.float32)
        return acc

    dx = jax.lax.fori_loop(
        0, K, tap_row, jnp.zeros((bt, H, W, C), jnp.float32)
    )
    dx_ref[...] = dx.astype(dx_ref.dtype)

    # dw[i, j, c] = sum_{b,h,w} x[b, h+i-3, w+j-3, c] * g[b, h, w, c]
    #            = sum over the center-aligned overlap of x and shifted g.
    # Shift g instead of x so the slice arithmetic stays within gp's pad.
    def wgrad_row(i, _):
        gr = gp_ref[:, pl.ds(K - 1 - i, H), :, :]
        for j in range(K):
            prod = xc * gr[:, :, K - 1 - j : K - 1 - j + W, :]
            dw_ref[i, j, :] += jnp.sum(
                prod.astype(jnp.float32), axis=(0, 1, 2)
            ).astype(dw_ref.dtype)
        return 0

    jax.lax.fori_loop(0, K, wgrad_row, 0)


def _dw_kernel(xc_ref, gp_ref, dw_ref):
    """Wgrad-only kernel (split path for big feature maps where the fused
    bwd does not fit scoped VMEM even at bt=1). Same accumulation as the
    tail of :func:`_bwd_kernel`."""
    bt, H, W, C = xc_ref.shape
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    xc = xc_ref[...]

    def wgrad_row(i, _):
        gr = gp_ref[:, pl.ds(K - 1 - i, H), :, :]
        for j in range(K):
            prod = xc * gr[:, :, K - 1 - j : K - 1 - j + W, :]
            dw_ref[i, j, :] += jnp.sum(
                prod.astype(jnp.float32), axis=(0, 1, 2)
            ).astype(dw_ref.dtype)
        return 0

    jax.lax.fori_loop(0, K, wgrad_row, 0)


# --------------------------------------------------------------------------
# pallas_call wrappers
# --------------------------------------------------------------------------


def _conv_same_pallas(x: jnp.ndarray, w: jnp.ndarray, interpret: bool) -> jnp.ndarray:
    B, H, W, C = x.shape
    bt = _batch_tile(B, H, W, C, _fwd_bytes_per_image(H, W, C))
    xp = jnp.pad(x, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)))
    return pl.pallas_call(
        _fwd_kernel,
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((bt, H + 2 * PAD, W + 2 * PAD, C), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((K, K, C), lambda b: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bt, H, W, C), lambda b: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(xp, w)


def _wgrad_pallas(x, g, interpret: bool) -> jnp.ndarray:
    B, H, W, C = x.shape
    # xc double-buffered + gp double-buffered + f32 row-slice temps
    per_image = 4 * H * W * C + 12 * (H + 2 * PAD) * (W + 2 * PAD) * C
    bt = _batch_tile(B, H, W, C, per_image)
    gp = jnp.pad(g, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)))
    return pl.pallas_call(
        _dw_kernel,
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((bt, H, W, C), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((bt, H + 2 * PAD, W + 2 * PAD, C), lambda b: (b, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((K, K, C), lambda b: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((K, K, C), jnp.float32),
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(x, gp)


def _bwd_pallas(x, g, w, interpret: bool):
    B, H, W, C = x.shape
    if _bwd_bytes_per_image(H, W, C) > _VMEM_BUDGET:
        # Fused bwd does not fit scoped VMEM even one image at a time
        # (stage-0-sized feature maps): split into two half-footprint
        # kernels — dx is the fwd stencil on g with the flipped filter.
        dx = _conv_same_pallas(g, w[::-1, ::-1, :], interpret)
        dw = _wgrad_pallas(x, g, interpret)
        return dx, dw
    bt = _batch_tile(B, H, W, C, _bwd_bytes_per_image(H, W, C))
    gp = jnp.pad(g, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)))
    dx, dw = pl.pallas_call(
        _bwd_kernel,
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((bt, H, W, C), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((bt, H + 2 * PAD, W + 2 * PAD, C), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((K, K, C), lambda b: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bt, H, W, C), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((K, K, C), lambda b: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
            jax.ShapeDtypeStruct((K, K, C), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(x, gp, w)
    return dx, dw


# --------------------------------------------------------------------------
# public op with custom VJP
# --------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _dwconv(x: jnp.ndarray, w: jnp.ndarray, interpret: bool) -> jnp.ndarray:
    return _conv_same_pallas(x, w, interpret)


def _dwconv_fwd(x, w, interpret):
    return _conv_same_pallas(x, w, interpret), (x, w)


def _dwconv_bwd(interpret, res, g):
    x, w = res
    dx, dw = _bwd_pallas(x, g, w.astype(x.dtype), interpret)
    return dx.astype(x.dtype), dw.astype(w.dtype)


_dwconv.defvjp(_dwconv_fwd, _dwconv_bwd)


def _conv_lax(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    C = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x, w[:, :, None, :], (1, 1), "SAME",
        feature_group_count=C,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def depthwise_conv7x7(
    x: jnp.ndarray,
    w: jnp.ndarray,
    use_pallas: bool | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Depthwise SAME conv, x (B,H,W,C), w (7,7,C) (no bias).
    Routes to the Pallas kernel on TPU, lax.conv elsewhere."""
    if w.shape[0] != K or w.shape[1] != K:
        return _conv_lax(x, w)
    if use_pallas is None:
        use_pallas = pallas_available()
    if use_pallas or interpret:
        return _dwconv(x, w.astype(x.dtype), interpret)
    return _conv_lax(x, w)
