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
