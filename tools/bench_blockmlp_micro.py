"""Microbench: per-stage block-MLP Pallas kernel vs raw XLA matmuls on the
real TPU. Separates MXU ceiling (pure dots at the same shapes) from kernel
overhead (LN/GELU VPU work + pipeline bubbles). In-jit fori_loop timing with
a final host readback (axon per-dispatch timing lies — CLAUDE.md).

Usage: python tools/bench_blockmlp_micro.py [n_iters]
Prints, per (M, C) stage shape: pallas fwd, pallas fwd+bwd, raw-dots fwd,
raw fwd+bwd, each as ms/iter and TFLOP/s.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from image_classification_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from image_classification_tpu.ops.block_mlp import block_mlp, pick_tm

# ConvNeXt-B @260, batch 32: (rows, C, n_blocks_in_stage)
SHAPES = [
    (135200, 128, 3),
    (34848, 256, 3),
    (9248, 512, 27),
]


def timed(fn, *args, n=None):
    out = fn(*args)
    jax.tree.map(lambda a: a.block_until_ready(), out)
    t0 = time.perf_counter()
    out = fn(*args)
    s = float(jax.tree.reduce(
        lambda a, b: a + b, jax.tree.map(lambda a: jnp.sum(a.astype(jnp.float32)), out)
    ))
    assert np.isfinite(s)
    return time.perf_counter() - t0


def main():
    n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    rng = np.random.default_rng(0)
    for m, c, _nb in SHAPES:
        h4 = 4 * c
        x = jnp.asarray(rng.standard_normal((m, c)), jnp.bfloat16)
        res = jnp.asarray(rng.standard_normal((m, c)), jnp.bfloat16)
        s = jnp.ones((c,), jnp.float32)
        t = jnp.zeros((c,), jnp.float32)
        w1 = jnp.asarray(rng.standard_normal((c, h4)) * 0.02, jnp.float32)
        b1 = jnp.zeros((h4,), jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((h4, c)) * 0.02, jnp.float32)
        b2 = jnp.zeros((c,), jnp.float32)
        g = jnp.full((c,), 1e-6, jnp.float32)
        tm = pick_tm(m, c=c)
        flop_fwd = 16 * m * c * c  # fc1 + fc2 (2 matmuls, 2 flop/MAC)

        def perturb(x, acc):
            # loop-carried dependency: forces one body execution per
            # iteration (without it XLA hoists the loop-invariant body and
            # every arm measures a single execution). bf16 underflows the
            # 1e-30 to zero in VALUE, but the add still depends on acc.
            return x + (acc * 1e-30).astype(x.dtype)

        @jax.jit
        def pallas_fwd(x, res, w1, w2):
            def body(i, acc):
                o = block_mlp(perturb(x, acc), res, s, t, w1, b1, w2, b2, g,
                              1e-6, tm, False)
                return acc + jnp.sum(o[:1, :].astype(jnp.float32))
            return jax.lax.fori_loop(0, n_iters, body, jnp.zeros((), jnp.float32))

        @jax.jit
        def pallas_fwdbwd(x, res, w1, w2):
            def loss(x, res, w1, w2):
                o = block_mlp(x, res, s, t, w1, b1, w2, b2, g, 1e-6, tm, False)
                return jnp.sum(o.astype(jnp.float32))
            def body(i, acc):
                l, grads = jax.value_and_grad(loss, argnums=(0, 2, 3))(
                    perturb(x, acc), res, w1, w2)
                return acc + l + sum(jnp.sum(gr[:1].astype(jnp.float32)) for gr in grads)
            return jax.lax.fori_loop(0, n_iters, body, jnp.zeros((), jnp.float32))

        def xla_tail(x, res, w1, w2):
            xf = x.astype(jnp.float32)
            mu = jnp.mean(xf, axis=1, keepdims=True)
            var = jnp.mean(xf * xf, axis=1, keepdims=True) - mu * mu
            z = (xf - mu) * jax.lax.rsqrt(var + 1e-6)
            xhat = (z * s + t).astype(jnp.bfloat16)
            a = jax.lax.dot_general(xhat, w1.astype(jnp.bfloat16),
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32) + b1
            h = jax.nn.gelu(a, approximate=False).astype(jnp.bfloat16)
            u = jax.lax.dot_general(h, w2.astype(jnp.bfloat16),
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32) + b2
            return res.astype(jnp.float32) + g * u

        @jax.jit
        def xla_fwd(x, res, w1, w2):
            def body(i, acc):
                o = xla_tail(perturb(x, acc), res, w1, w2)
                return acc + jnp.sum(o[:1, :])
            return jax.lax.fori_loop(0, n_iters, body, jnp.zeros((), jnp.float32))

        @jax.jit
        def xla_fwdbwd(x, res, w1, w2):
            def loss(x, res, w1, w2):
                return jnp.sum(xla_tail(x, res, w1, w2))
            def body(i, acc):
                l, grads = jax.value_and_grad(loss, argnums=(0, 2, 3))(
                    perturb(x, acc), res, w1, w2)
                return acc + l + sum(jnp.sum(gr[:1].astype(jnp.float32)) for gr in grads)
            return jax.lax.fori_loop(0, n_iters, body, jnp.zeros((), jnp.float32))

        @jax.jit
        def dots_only(x, w1, w2):
            def body(i, acc):
                a = jax.lax.dot_general(perturb(x, acc), w1.astype(jnp.bfloat16),
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                u = jax.lax.dot_general(a.astype(jnp.bfloat16), w2.astype(jnp.bfloat16),
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                return acc + jnp.sum(u[:1, :])
            return jax.lax.fori_loop(0, n_iters, body, jnp.zeros((), jnp.float32))

        rows = []
        for name, fn, args, flop in (
            ("pallas fwd", pallas_fwd, (x, res, w1, w2), flop_fwd),
            ("pallas f+b", pallas_fwdbwd, (x, res, w1, w2), 3 * flop_fwd),
            ("xla    fwd", xla_fwd, (x, res, w1, w2), flop_fwd),
            ("xla    f+b", xla_fwdbwd, (x, res, w1, w2), 3 * flop_fwd),
            ("dots   fwd", dots_only, (x, w1, w2), flop_fwd),
        ):
            dt = timed(fn, *args) / n_iters
            rows.append(f"  {name}: {dt * 1e3:7.3f} ms/it  "
                        f"{flop / dt / 1e12:6.1f} TFLOP/s")
        print(f"(M={m}, C={c}, tm={tm})")
        print("\n".join(rows), flush=True)


if __name__ == "__main__":
    main()
