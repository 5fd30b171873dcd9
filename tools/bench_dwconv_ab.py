"""In-graph A/B of ConvNeXt-B fwd+bwd across dwconv implementations.

Usage: python tools/bench_dwconv_ab.py [impl ...] [batch=32] [iters=20]
       (default impls: conv shift pallas)

The depthwise conv is ~5% of the model's FLOPs but drives XLA's layout
assignment: lax.conv prefers channel-major ``{3,0,2,1}`` activations, and
the relayout copies it forces around every block depress the MLP matmuls
(docs/PERF_NOTES.md round-2 log). ``shift`` (49 static-shift FMAs in XLA)
and ``pallas`` (ops/dwconv.py stencil kernel) both consume row-major NHWC
directly — this tool measures whether removing the relayouts beats lax's
faster conv math *in-graph*, which micro-benches cannot answer.

Timing: in-jit ``lax.fori_loop`` over grad steps chained through the params
(pure compute, immune to the axon early-return dispatch issue).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# pin_layout only helps the lax.conv path (it confines that conv's
# channel-major preference); shift/pallas are layout-neutral already
PIN = {"conv": True, "shift": False, "pallas": False}


def main() -> None:
    import jax
    import jax.numpy as jnp

    from image_classification_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    from image_classification_tpu.core.config import Config
    from image_classification_tpu.models.factory import create_model

    impls, batch, iters = [], 32, 20
    for a in sys.argv[1:]:
        if a.startswith("batch="):
            batch = int(a.split("=")[1])
        elif a.startswith("iters="):
            iters = int(a.split("=")[1])
        else:
            impls.append(a)
    impls = impls or ["conv", "shift", "pallas"]

    rng = np.random.default_rng(0)
    for impl in impls:
        cfg = Config(
            model_name="convnext_base",
            batch_size=batch,
            dwconv_impl=impl,
            pin_layout=PIN.get(impl, False),
            use_deep_supervision=True,
            compute_dtype="bfloat16",
        ).validate()
        bundle = create_model(cfg)
        variables = bundle.init(jax.random.key(0))
        params = variables["params"]
        x = jnp.asarray(
            rng.normal(size=(batch, *cfg.image_size, 3)), jnp.float32
        )

        def loss_fn(params, x):
            outs = bundle.module.apply(
                {"params": params}, x, deterministic=True
            )
            main = outs[0] if isinstance(outs, (tuple, list)) else outs
            return jnp.mean(main.astype(jnp.float32) ** 2)

        @jax.jit
        def bench(params, x):
            def body(i, p):
                g = jax.grad(loss_fn)(p, x)
                return jax.tree.map(
                    lambda a, b: a - 1e-12 * b.astype(a.dtype), p, g
                )
            return jax.lax.fori_loop(0, iters, body, params)

        t0 = time.perf_counter()
        out = bench(params, x)
        leaf = jax.tree.leaves(out)[0]
        float(jnp.sum(leaf.astype(jnp.float32)))  # compile + run readback
        t_compile = time.perf_counter() - t0

        t0 = time.perf_counter()
        out = bench(params, x)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / iters
        print(
            f"{impl:7s} pin={PIN.get(impl, False)!s:5s} "
            f"fwd+bwd {dt*1e3:7.2f} ms/it  {batch/dt:6.0f} img/s "
            f"(first-call {t_compile:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
