"""A/B the geometric warp implementations on the current backend.

Measures pure compute (in-jit fori_loop) for:
  - xla:    aug.geometry.bilinear_gather_mxu (two contractions, HBM tmp)
  - pallas: ops.warp.warp_pallas (fused, VMEM-resident)

Usage: python tools/bench_warp.py [batch=32] [iters=20]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    batch, iters = 32, 20
    for a in sys.argv[1:]:
        k, v = a.split("=")
        if k == "batch":
            batch = int(v)
        elif k == "iters":
            iters = int(v)

    import jax
    import jax.numpy as jnp

    from image_classification_tpu.aug.geometry import bilinear_gather_mxu
    from image_classification_tpu.ops.warp import warp_pallas

    rng = np.random.default_rng(0)
    img = jnp.asarray(
        rng.uniform(0, 1, (batch, 60, 80, 3)).astype(np.float32)
    ).astype(jnp.bfloat16)
    coords = jnp.asarray(
        np.stack(
            [
                rng.uniform(-8, 68, (batch, 260, 260)),
                rng.uniform(-8, 88, (batch, 260, 260)),
            ],
            axis=-1,
        ).astype(np.float32)
    )

    def pure_time(fn, name):
        @jax.jit
        def run(img, coords):
            def body(i, acc):
                out = fn(img + acc * 0, coords)
                return acc + jnp.sum(out[:, 0, 0, :].astype(jnp.float32))

            return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

        float(run(img, coords))  # compile + warm
        t0 = time.perf_counter()
        float(run(img, coords))
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: {dt*1e3:.2f} ms/batch, {batch/dt:.0f} img/s", flush=True)
        return dt

    from image_classification_tpu.aug.geometry import bilinear_gather_mxu_xfirst

    a = pure_time(bilinear_gather_mxu, "xla y-first        ")
    c = pure_time(bilinear_gather_mxu_xfirst, "xla x-first        ")
    b = pure_time(warp_pallas, "pallas fused       ")
    print(f"pallas/xla: {b/a:.3f}x  xfirst/yfirst: {c/a:.3f}x")

    # numerics spot check on device
    ref = np.asarray(bilinear_gather_mxu(img, coords)).astype(np.float32)
    got = np.asarray(warp_pallas(img, coords)).astype(np.float32)
    err = np.abs(ref - got).max()
    print(f"max abs diff vs xla form: {err:.4f}")


if __name__ == "__main__":
    main()
