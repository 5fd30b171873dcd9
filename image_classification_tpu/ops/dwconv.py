"""Pallas TPU kernel: 7x7 depthwise convolution (ConvNeXt's spatial mixer).

XLA lowers NHWC depthwise convs poorly on TPU (profiled at ~8 TFLOP/s-class
efficiency, ~17 ms/step across ConvNeXt-B — see docs/PERF_NOTES.md). The
stencil is tiny and perfectly VPU-shaped, so the kernel keeps one image
(plus halo) resident in VMEM and accumulates the 49 taps as vector FMAs in
f32, one grid program per batch element:

    out[h, w, c] = sum_{i,j} x[h+i, w+j, c] * w[i, j, c]

Backward is two more stencils via custom_vjp: dx is the same kernel with a
spatially flipped filter; dw accumulates per-tap reductions across the grid
using the sequential-grid revisiting pattern (init at program 0, += after).

Falls back to lax.conv on non-TPU backends (tests run the kernel in
interpreter mode for correctness).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

K = 7
PAD = K // 2


def pallas_available() -> bool:
    if os.environ.get("IC_TPU_NO_PALLAS"):
        return False
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    return platform in ("tpu", "axon")


# --------------------------------------------------------------------------
# kernels
# --------------------------------------------------------------------------

def _fwd_kernel(x_ref, w_ref, out_ref):
    """x (1, H+6, W+6, C), w (K, K, C) -> out (1, H, W, C)."""
    _, H, W, C = out_ref.shape
    acc = jnp.zeros((H, W, C), jnp.float32)
    for i in range(K):
        for j in range(K):
            tap = x_ref[0, i : i + H, j : j + W, :].astype(jnp.float32)
            acc += tap * w_ref[i, j, :].astype(jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


def _dw_kernel(x_ref, g_ref, dw_ref):
    """x (1, H+6, W+6, C), g (1, H, W, C) -> dw (K, K, C), accumulated
    across the (sequential) batch grid. The tap loop is a fori_loop so the
    compiler reuses one tap buffer instead of 49 live f32 temporaries
    (unrolling blows the scoped-VMEM stack)."""
    b = pl.program_id(0)
    _, H, W, C = g_ref.shape

    @pl.when(b == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    gb = g_ref[0]  # bf16; products in bf16, accumulation in f32

    def body(i, _):
        # dynamic offset on the third-minor (row) dim is legal; the sublane
        # (W) dim only sees static offsets j (Mosaic requires 8-aligned
        # dynamic sublane offsets)
        xrows = x_ref[0, pl.ds(i, H), :, :]
        for j in range(K):
            prod = xrows[:, j : j + W, :] * gb
            contrib = jnp.sum(prod.astype(jnp.float32), axis=(0, 1))
            dw_ref[i, j, :] += contrib.astype(dw_ref.dtype)
        return 0

    jax.lax.fori_loop(0, K, body, 0)


def _conv_same_pallas(x: jnp.ndarray, w: jnp.ndarray, interpret: bool) -> jnp.ndarray:
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)))
    return pl.pallas_call(
        _fwd_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H + 2 * PAD, W + 2 * PAD, C), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((K, K, C), lambda b: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        interpret=interpret,
    )(xp, w)


def _wgrad_pallas(x: jnp.ndarray, g: jnp.ndarray, interpret: bool) -> jnp.ndarray:
    B, H, W, C = g.shape
    xp = jnp.pad(x, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)))
    return pl.pallas_call(
        _dw_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H + 2 * PAD, W + 2 * PAD, C), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((K, K, C), lambda b: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((K, K, C), jnp.float32),
        interpret=interpret,
    )(xp, g)


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
    # dx: correlate g with the spatially flipped filter
    dx = _conv_same_pallas(g, w[::-1, ::-1, :], interpret).astype(x.dtype)
    dw = _wgrad_pallas(x, g, interpret).astype(w.dtype)
    return dx, dw


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
