"""Per-stage augmentation timing on the current backend."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def t(fn, *args, iters=10):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from image_classification_tpu.aug import color as C
    from image_classification_tpu.aug import erase as E
    from image_classification_tpu.aug import filters as F
    from image_classification_tpu.aug import geometry as G
    from image_classification_tpu.aug.mix import MixCfg, mixup_cutmix_batch
    from image_classification_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    B = 32
    rng = np.random.default_rng(0)
    native = jnp.asarray(rng.uniform(0, 255, (B, 60, 80, 3)).astype(np.float32))
    big = jnp.asarray(rng.uniform(0, 255, (B, 260, 260, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 44, B).astype(np.int32))
    key = jax.random.key(0)

    geo = jax.jit(
        lambda x, k: G.geometric_augment(x, k, (260, 260), G.GeometryCfg())
    )
    geo_nodist = jax.jit(
        lambda x, k: G.geometric_augment(
            x, k, (260, 260),
            G.GeometryCfg(distortion=G.DistortionCfg(prob=0.0)),
        )
    )
    nb = jax.jit(lambda x, k: F.noise_blur_oneof(x, k, F.NoiseBlurCfg()))
    cj = jax.jit(lambda x, k: C.color_jitter(x, k, C.ColorJitterCfg()))
    cs = jax.jit(lambda x, k: C.color_shift_oneof(x, k, C.ColorShiftCfg()))
    er = jax.jit(lambda x, k: E.coarse_dropout(x, k, E.EraseCfg()))
    mx = jax.jit(
        lambda x, l, k: mixup_cutmix_batch(x, l, k, MixCfg())
    )
    dist = jax.jit(
        lambda k: G.distortion_source_map(k, B, (260, 260), G.DistortionCfg())
    )
    gather = jax.jit(
        lambda x, c: G.bilinear_gather(x, c)
    )
    coords = jnp.asarray(
        rng.uniform(0, 59, (B, 260, 260, 2)).astype(np.float32)
    )

    print(f"geometric (full):    {t(geo, native, key):8.2f} ms")
    print(f"geometric (no dist): {t(geo_nodist, native, key):8.2f} ms")
    print(f"  bare gather:       {t(gather, native, coords):8.2f} ms")
    print(f"  distortion maps:   {t(dist, key):8.2f} ms")
    print(f"noise/blur:          {t(nb, big, key):8.2f} ms")
    print(f"color jitter:        {t(cj, big, key):8.2f} ms")
    print(f"color shift:         {t(cs, big, key):8.2f} ms")
    print(f"coarse dropout:      {t(er, big, key):8.2f} ms")
    print(f"mixup/cutmix:        {t(mx, big, labels, key):8.2f} ms")


if __name__ == "__main__":
    main()
