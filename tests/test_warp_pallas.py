"""Fused Pallas warp vs the XLA MXU formulation (interpreter mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from image_classification_tpu.aug.geometry import bilinear_gather_mxu
from image_classification_tpu.ops.warp import warp_pallas


@pytest.mark.parametrize("seed", [0, 1])
def test_warp_pallas_matches_xla(rng, seed):
    r = np.random.default_rng(seed)
    img = jnp.asarray(r.uniform(0, 255, (2, 60, 80, 3)).astype(np.float32))
    coords = jnp.asarray(
        np.stack(
            [r.uniform(-8, 68, (2, 37, 53)), r.uniform(-8, 88, (2, 37, 53))],
            axis=-1,
        ).astype(np.float32)
    )
    a = np.asarray(bilinear_gather_mxu(img, coords))
    b = np.asarray(warp_pallas(img, coords, interpret=True))
    np.testing.assert_allclose(b, a, atol=2e-3, rtol=1e-5)


def test_warp_pallas_bf16(rng):
    img = jnp.asarray(
        rng.integers(0, 256, (1, 24, 32, 3)).astype(np.float32)
    ).astype(jnp.bfloat16)
    ys, xs = np.mgrid[0:24, 0:32].astype(np.float32)
    coords = jnp.asarray(np.stack([ys, xs], -1)[None])
    out = warp_pallas(img, coords, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out).astype(np.float32),
        np.asarray(img).astype(np.float32),
        atol=1.0,
    )
