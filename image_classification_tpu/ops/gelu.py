"""Erf-free exact GELU for the XLA (non-kernel) model paths.

XLA lowers ``jax.nn.gelu(approximate=False)`` through ``erf``, whose
rational expansion dominates the VPU cost of the stage-3 ConvNeXt tail
(the round-3 endpoint table's "s3 erf GELU" item). The fused block kernel
(ops/block_mlp.py) already replaces it with the Abramowitz & Stegun
7.1.26 erf — one ``exp`` plus a 5-term polynomial, max error ~1.5e-7,
orders of magnitude below the bf16 resolution the activations live in —
and a shared-exp gradient. This module exposes the same math as a
``custom_jvp`` scalar op for the flax paths (stage 3, demoted stages,
ViT), so exact-GELU semantics are preserved at tanh-approx speed.

Measured in-graph (tools/bench_override_ab.py, real TPU, 2026-08-21):
switching the whole model to tanh GELU was +4.4% (429.0 -> 448.0 img/s);
this op captures the same lowering win without the ~1e-3 activation
deltas tanh GELU introduces.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from image_classification_tpu.ops.block_mlp import _gelu_exact, _gelu_grad


@jax.custom_jvp
def gelu_erf_free(x: jnp.ndarray) -> jnp.ndarray:
    """Exact-erf GELU (A&S erf, f32 internals), same dtype out as in."""
    return _gelu_exact(x.astype(jnp.float32)).astype(x.dtype)


@gelu_erf_free.defjvp
def _gelu_erf_free_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    xf = x.astype(jnp.float32)
    y = _gelu_exact(xf).astype(x.dtype)
    dy = (_gelu_grad(xf) * dx.astype(jnp.float32)).astype(x.dtype)
    return y, dy


# ---------------------------------------------------------------------------
# Pallas elementwise path: the same exact-GELU math emitted as ONE custom
# call per direction. Rationale (VERDICT r4 #4): the whole-model tanh A/B
# measured +4.4% step throughput and the ledger attributed the win to
# tanh's single-op lowering, not to erf's flop count — XLA splits the A&S
# expansion across fusion boundaries around the stage-3 matmuls. A Pallas
# kernel pins the whole expansion (one exp + 5-term poly) into a single
# fused VPU pass over each tile; the bwd kernel shares the exp between the
# erf and the Gaussian pdf exactly like the fused block kernel does.
# Opt-in via ``gelu_impl=pallas`` (core/config.py) — measured on real TPU
# before defaulting (docs/PERF_NOTES.md round-5 log).
# ---------------------------------------------------------------------------


def _gelu_interpret() -> bool:
    import os

    return bool(os.environ.get("IC_TPU_GELU_INTERPRET"))


def _gelu_fwd_kernel(x_ref, y_ref):
    a = x_ref[...].astype(jnp.float32)
    y_ref[...] = _gelu_exact(a).astype(y_ref.dtype)


def _gelu_bwd_kernel(x_ref, dy_ref, dx_ref):
    a = x_ref[...].astype(jnp.float32)
    dx_ref[...] = (
        _gelu_grad(a) * dy_ref[...].astype(jnp.float32)
    ).astype(dx_ref.dtype)


def _run_elementwise(kernel, out_dtype, x, *rest):
    from jax.experimental import pallas as pl

    shape = x.shape
    C = shape[-1]
    flat = [a.reshape(-1, C) for a in (x, *rest)]
    M = flat[0].shape[0]
    bm = min(M, 256)
    bc = min(C, 2048)
    spec = pl.BlockSpec((bm, bc), lambda i, j: (i, j))
    y = pl.pallas_call(
        kernel,
        grid=(pl.cdiv(M, bm), pl.cdiv(C, bc)),
        in_specs=[spec] * len(flat),
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((M, C), out_dtype),
        interpret=_gelu_interpret(),
    )(*flat)
    return y.reshape(shape)


@jax.custom_vjp
def gelu_erf_free_pallas(x: jnp.ndarray) -> jnp.ndarray:
    """Exact-erf GELU as one Pallas elementwise kernel per direction.

    Same math as :func:`gelu_erf_free` (A&S erf fwd, shared-exp bwd);
    requires a >=2-D input whose last dim is a multiple of 128 (use
    :func:`gelu_dispatch` for automatic fallback)."""
    return _run_elementwise(_gelu_fwd_kernel, x.dtype, x)


def _gelu_pallas_fwd(x):
    return _run_elementwise(_gelu_fwd_kernel, x.dtype, x), x


def _gelu_pallas_bwd(x, dy):
    return (_run_elementwise(_gelu_bwd_kernel, x.dtype, x, dy),)


gelu_erf_free_pallas.defvjp(_gelu_pallas_fwd, _gelu_pallas_bwd)


def gelu_dispatch(x: jnp.ndarray, impl: str = "xla") -> jnp.ndarray:
    """Exact GELU with implementation selection: ``pallas`` takes the
    single-custom-call kernel when the shape tiles (last dim % 128 == 0),
    ``erf`` takes XLA's own erf expansion (``jax.nn.gelu`` — the round-3
    baseline, kept for perf-ledger A/Bs), and ``xla`` (default) the
    fused-into-XLA A&S form."""
    if impl == "pallas" and x.ndim >= 2 and x.shape[-1] % 128 == 0:
        return gelu_erf_free_pallas(x)
    if impl == "erf":
        return jax.nn.gelu(x, approximate=False)
    return gelu_erf_free(x)
