"""Pallas TPU kernel: fused ConvNeXt block tail — LN -> fc1 -> GELU -> fc2 ->
layer-scale -> residual — forward + custom VJP.

Motivation (docs/PERF_NOTES.md round-2 profile): on the XLA path the block
tail is 5 HBM round-trips per block (LN stats + normalize, fc1 out store for
the backward, GELU, fc2, scale+residual), the fc1 output is stored twice
(fwd epilogue + bwd residual), and LayerNorm stats alone cost ~3.4 ms/step.
This kernel runs the whole tail per (TM, C) row tile inside VMEM: one pass
over x computes f32 stats, normalizes, runs both matmuls on the MXU with the
(TM, 4C) intermediate never leaving VMEM, and writes only the block output.

The forward kernel additionally stores the two cheap-to-keep intermediates
``a`` (pre-GELU fc1 output, bf16) and ``u`` (fc2 output, bf16) so the
backward runs exactly the four gradient matmuls (dh, dxhat, dw1, dw2) with
no fc1/fc2 recompute — measured r3: the recompute variant spent 6 matmuls
per tile and the stage-2 backward alone was 20.8 ms/step. LayerNorm
normalization is recomputed from x on the VPU (stats are two row reduces).
Weight/affine gradients accumulate in f32 VMEM across the sequential grid,
so no f32 (M, 4C) residual is ever materialized in HBM.

Semantics match `models/convnext.py:ConvNeXtBlock` (post-dwconv part) with
exact erf GELU; reference anchor: timm ConvNeXt block MLP
(`train_advanced_v4.py:96-151` wraps it for deep supervision).

Used when ``cfg.block_mlp_impl == "pallas"`` (single-chip path; the XLA
formulation remains the default and the multi-chip path).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_SQRT_HALF = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327


def _erf(x: jnp.ndarray) -> jnp.ndarray:
    """Rational erf approximation (Abramowitz & Stegun 7.1.26, |err| <=
    1.5e-7 — below f32 gelu noise and ~3 decades below bf16 resolution).
    Mosaic has no erf primitive; exp is the only transcendental used."""
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return jnp.sign(x) * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(a: jnp.ndarray) -> jnp.ndarray:
    """Exact-erf GELU in f32 — matches jax.nn.gelu(approximate=False) to
    ~1e-7 via the A&S erf."""
    return 0.5 * a * (1.0 + _erf(a * _SQRT_HALF))


def _gelu_grad(a: jnp.ndarray) -> jnp.ndarray:
    """d/da of exact GELU. One transcendental: erf's argument is a*sqrt(1/2),
    so the A&S erf's internal exp(-x^2) IS the Gaussian pdf's exp(-a^2/2) —
    share it instead of paying a second exp (exp dominates the VPU cost of
    the backward GELU tail)."""
    x = a * _SQRT_HALF
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    e = jnp.exp(-ax * ax)  # = exp(-a^2 / 2)
    erf = jnp.sign(x) * (1.0 - poly * e)
    cdf = 0.5 * (1.0 + erf)
    pdf = _INV_SQRT_2PI * e
    return cdf + a * pdf


def _norm_stats(xf: jnp.ndarray, eps: float):
    """f32 LayerNorm stats over the last dim (flax semantics: biased var,
    eps inside the rsqrt)."""
    mu = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean(xf * xf, axis=1, keepdims=True) - mu * mu
    r = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    return mu, r


def _fwd_kernel(x_ref, res_ref, s_ref, t_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                g_ref, out_ref, *extra_refs, eps: float):
    xf = x_ref[:].astype(jnp.float32)
    mu, r = _norm_stats(xf, eps)
    z = (xf - mu) * r
    xhat = (z * s_ref[:].astype(jnp.float32) + t_ref[:].astype(jnp.float32))
    a = jax.lax.dot_general(
        xhat.astype(x_ref.dtype), w1_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[:].astype(jnp.float32)
    h = _gelu_exact(a)
    u = jax.lax.dot_general(
        h.astype(x_ref.dtype), w2_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[:].astype(jnp.float32)
    # the residual is the BLOCK input (pre-dwconv shortcut), a separate
    # operand from x (the dwconv output feeding the LN)
    out = res_ref[:].astype(jnp.float32) + g_ref[:].astype(jnp.float32) * u
    out_ref[:] = out.astype(out_ref.dtype)
    if extra_refs:  # bf16 residuals for the 4-matmul backward (only stored
        a_ref, u_ref = extra_refs  # under grad; the primal skips the writes)
        a_ref[:] = a.astype(a_ref.dtype)
        u_ref[:] = u.astype(u_ref.dtype)


def _bwd_kernel(x_ref, a_ref, u_ref, s_ref, t_ref, w1_ref, b1_ref, w2_ref,
                b2_ref, g_ref, dy_ref,
                dx_ref, ds_ref, dt_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                dg_ref, *, eps: float):
    i = pl.program_id(0)
    f32 = jnp.float32
    dtype = x_ref.dtype
    # ---- VPU-only recompute: LN normalization from x; gelu(a) from the
    # saved pre-activation. No forward matmul is re-run.
    xf = x_ref[:].astype(f32)
    mu, r = _norm_stats(xf, eps)
    z = (xf - mu) * r
    s = s_ref[:].astype(f32)
    xhat_bf = (z * s + t_ref[:].astype(f32)).astype(dtype)
    a = a_ref[:].astype(f32)
    h_bf = _gelu_exact(a).astype(dtype)
    u = u_ref[:].astype(f32)

    # ---- gradient chain
    dy = dy_ref[:].astype(f32)
    du = dy * g_ref[:].astype(f32)
    du_bf = du.astype(dtype)
    # dh = du @ W2^T   (contract the C dim of both)
    dh = jax.lax.dot_general(
        du_bf, w2_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )
    da = dh * _gelu_grad(a)
    da_bf = da.astype(dtype)
    # dxhat = da @ W1^T  (contract the 4C dim)
    dxhat = jax.lax.dot_general(
        da_bf, w1_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )
    dz = dxhat * s
    m1 = jnp.mean(dz, axis=1, keepdims=True)
    m2 = jnp.mean(dz * z, axis=1, keepdims=True)
    # dres = dy passes through in the VJP wrapper; dx is the LN chain only
    dx = r * (dz - m1 - z * m2)
    dx_ref[:] = dx.astype(dx_ref.dtype)

    # ---- accumulated parameter grads (f32, one block revisited every step)
    dw1_c = jax.lax.dot_general(   # xhat^T @ da  -> (C, 4C)
        xhat_bf, da_bf,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    dw2_c = jax.lax.dot_general(   # h^T @ du  -> (4C, C)
        h_bf, du_bf,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    ds_c = jnp.sum(dxhat * z, axis=0, keepdims=True)
    dt_c = jnp.sum(dxhat, axis=0, keepdims=True)
    db1_c = jnp.sum(da, axis=0, keepdims=True)
    db2_c = jnp.sum(du, axis=0, keepdims=True)
    dg_c = jnp.sum(dy * u, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _init():
        dw1_ref[:] = dw1_c
        dw2_ref[:] = dw2_c
        ds_ref[:] = ds_c
        dt_ref[:] = dt_c
        db1_ref[:] = db1_c
        db2_ref[:] = db2_c
        dg_ref[:] = dg_c

    @pl.when(i != 0)
    def _accum():
        dw1_ref[:] += dw1_c
        dw2_ref[:] += dw2_c
        ds_ref[:] += ds_c
        dt_ref[:] += dt_c
        db1_ref[:] += db1_c
        db2_ref[:] += db2_c
        dg_ref[:] += dg_c


def pick_tm(m: int, target: int = 512, cap: int = 768, c: int = 0) -> int:
    """Largest-leverage row-tile: a divisor of ``m`` (multiple of the 8
    sublanes, <= cap) nearest ``target`` in log-space, so the grid covers m
    EXACTLY — no pad/slice HBM copies, no padded-row flops. ConvNeXt-B @260,
    batch 32: m in {135200, 34848, 9248, 2592} -> tm {520, 528, 544, 288*}
    (*stage 3 runs with the halved wide-C target).
    Falls back to ``target`` (with padding) when m has no 8-multiple divisor.
    For wide blocks (c > 512) the (TM, 4C) f32 temporaries dominate VMEM, so
    the target/cap halve. Env overrides: IC_TPU_BLOCKMLP_TM (absolute tile),
    IC_TPU_BLOCKMLP_TARGET (retarget the divisor search; cap scales 1.5x)."""
    override = os.environ.get("IC_TPU_BLOCKMLP_TM")
    if override:
        return int(override)
    retarget = os.environ.get("IC_TPU_BLOCKMLP_TARGET")
    if retarget:
        target = int(retarget)
        cap = (target * 3) // 2
    if c > 512:
        target, cap = target // 2, cap // 2
    import math

    best = None
    for d in range(8, min(m, cap) + 1, 8):
        if m % d == 0:
            score = abs(math.log(d / target))
            if best is None or score < best[0]:
                best = (score, d)
    return best[1] if best else target


def _pad_rows(x: jnp.ndarray, tm: int) -> tuple[jnp.ndarray, int]:
    m = x.shape[0]
    mp = -(-m // tm) * tm
    if mp != m:
        x = jnp.pad(x, ((0, mp - m), (0, 0)))
    return x, mp


def _compiler_params(interpret: bool):
    if interpret:
        return None
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def block_mlp(x, res, s, t, w1, b1, w2, b2, g, eps=1e-6, tm=256,
              interpret=False):
    """y = res + g * fc2(gelu(fc1(LN(x)))) over rows of x (M, C).

    ``x`` is the dwconv output feeding the LN; ``res`` the block's shortcut
    input. bf16/f32 (M, C); params in any float dtype (cast to x.dtype for
    the MXU, f32 for stats/affine, like the flax path). Returns x.dtype.
    """
    out = _run_fwd(x, res, s, t, w1, b1, w2, b2, g, eps, tm, interpret,
                   save_residuals=False)[0]
    return out[: x.shape[0]]


def _run_fwd(x, res, s, t, w1, b1, w2, b2, g, eps, tm, interpret,
             save_residuals):
    m, c = x.shape
    h4 = w1.shape[1]
    xp, mp = _pad_rows(x, tm)
    resp, _ = _pad_rows(res.astype(x.dtype), tm)
    grid = (mp // tm,)
    dtype = x.dtype
    row = lambda v: v.reshape(1, -1).astype(dtype)
    out_specs = [pl.BlockSpec((tm, c), lambda i: (i, 0))]       # y
    out_shape = [jax.ShapeDtypeStruct((mp, c), dtype)]
    if save_residuals:
        out_specs += [
            pl.BlockSpec((tm, h4), lambda i: (i, 0)),           # a
            pl.BlockSpec((tm, c), lambda i: (i, 0)),            # u
        ]
        out_shape += [
            jax.ShapeDtypeStruct((mp, h4), dtype),
            jax.ShapeDtypeStruct((mp, c), dtype),
        ]
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, c), lambda i: (i, 0)),            # x
            pl.BlockSpec((tm, c), lambda i: (i, 0)),            # res
            *[pl.BlockSpec((1, c), lambda i: (0, 0))] * 2,      # s, t
            pl.BlockSpec((c, h4), lambda i: (0, 0)),            # w1
            pl.BlockSpec((1, h4), lambda i: (0, 0)),            # b1
            pl.BlockSpec((h4, c), lambda i: (0, 0)),            # w2
            pl.BlockSpec((1, c), lambda i: (0, 0)),             # b2
            pl.BlockSpec((1, c), lambda i: (0, 0)),             # g
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(xp, resp, row(s), row(t), w1.astype(dtype), row(b1), w2.astype(dtype),
      row(b2), row(g))
    return outs


def _block_mlp_fwd(x, res, s, t, w1, b1, w2, b2, g, eps, tm, interpret):
    out, a_saved, u_saved = _run_fwd(
        x, res, s, t, w1, b1, w2, b2, g, eps, tm, interpret,
        save_residuals=True,
    )
    m = x.shape[0]
    # a/u are saved PADDED (the backward re-derives the same mp from tm)
    return out[:m], (x, a_saved, u_saved, s, t, w1, b1, w2, b2, g)


def _block_mlp_bwd(eps, tm, interpret, saved, dy):
    x, a_saved, u_saved, s, t, w1, b1, w2, b2, g = saved
    m, c = x.shape
    h4 = w1.shape[1]
    dtype = x.dtype
    xp, mp = _pad_rows(x, tm)
    dyp, _ = _pad_rows(dy.astype(dtype), tm)
    grid = (mp // tm,)
    row = lambda v: v.reshape(1, -1).astype(dtype)
    f32 = jnp.float32
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, c), lambda i: (i, 0)),            # x
            pl.BlockSpec((tm, h4), lambda i: (i, 0)),           # a (padded)
            pl.BlockSpec((tm, c), lambda i: (i, 0)),            # u (padded)
            *[pl.BlockSpec((1, c), lambda i: (0, 0))] * 2,      # s, t
            pl.BlockSpec((c, h4), lambda i: (0, 0)),            # w1
            pl.BlockSpec((1, h4), lambda i: (0, 0)),            # b1
            pl.BlockSpec((h4, c), lambda i: (0, 0)),            # w2
            pl.BlockSpec((1, c), lambda i: (0, 0)),             # b2
            pl.BlockSpec((1, c), lambda i: (0, 0)),             # g
            pl.BlockSpec((tm, c), lambda i: (i, 0)),            # dy
        ],
        out_specs=[
            pl.BlockSpec((tm, c), lambda i: (i, 0)),            # dx
            pl.BlockSpec((1, c), lambda i: (0, 0)),             # ds
            pl.BlockSpec((1, c), lambda i: (0, 0)),             # dt
            pl.BlockSpec((c, h4), lambda i: (0, 0)),            # dw1
            pl.BlockSpec((1, h4), lambda i: (0, 0)),            # db1
            pl.BlockSpec((h4, c), lambda i: (0, 0)),            # dw2
            pl.BlockSpec((1, c), lambda i: (0, 0)),             # db2
            pl.BlockSpec((1, c), lambda i: (0, 0)),             # dg
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mp, c), dtype),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((c, h4), f32),
            jax.ShapeDtypeStruct((1, h4), f32),
            jax.ShapeDtypeStruct((h4, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
        ],
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(xp, a_saved, u_saved, row(s), row(t), w1.astype(dtype), row(b1),
      w2.astype(dtype), row(b2), row(g), dyp)
    dx, ds, dt, dw1, db1, dw2, db2, dg = outs
    cast = lambda v, ref: v.reshape(ref.shape).astype(ref.dtype)
    # dres: the residual passes dy straight through (no kernel work needed)
    return (dx[:m].astype(x.dtype), dy, cast(ds, s), cast(dt, t),
            cast(dw1, w1), cast(db1, b1), cast(dw2, w2), cast(db2, b2),
            cast(dg, g))


block_mlp.defvjp(_block_mlp_fwd, _block_mlp_bwd)


def interpret_forced() -> bool:
    """CPU-test hook: run the kernel in interpreter mode off-TPU."""
    return bool(os.environ.get("IC_TPU_BLOCKMLP_INTERPRET"))


def block_mlp_available(c: int) -> bool:
    """The kernel keeps both weight matrices + f32 grad accumulators in
    VMEM; C<=512 (ConvNeXt stages 0-2, 33/36 blocks) fits comfortably.
    C=1024 (stage 3) budgets ~48 MB of weights+accumulators alone and MEASURED
    SLOWER on TPU (same-harness A/B 2026-08-20: MAXC=1024 419.5 img/s vs
    default 426.1 — the halved row tile + grad-accumulator traffic lose to
    XLA's stage-3 matmuls). The IC_TPU_BLOCKMLP_MAXC=1024 override remains
    for re-measurement on future hardware."""
    if os.environ.get("IC_TPU_NO_PALLAS"):
        return False
    if c > int(os.environ.get("IC_TPU_BLOCKMLP_MAXC", "512")):
        return False
    if c < int(os.environ.get("IC_TPU_BLOCKMLP_MINC", "0")):
        return False  # A/B lever: route small-C stages back to XLA
    if interpret_forced():
        return True
    from image_classification_tpu.ops.dwconv import pallas_available

    return pallas_available()
