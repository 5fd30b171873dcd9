"""MXU-matmul bilinear warp must match the gather formulation exactly."""

import jax.numpy as jnp
import numpy as np
import pytest

from image_classification_tpu.aug.geometry import (
    bilinear_gather,
    bilinear_gather_mxu,
    reflect101_coord,
)


def test_reflect101_coord_matches_integer_fold():
    # float folding at sample points must agree with integer-tap folding
    from image_classification_tpu.aug.geometry import reflect101_index

    coords = jnp.arange(-10, 20, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(reflect101_coord(coords, 8)),
        np.asarray(reflect101_index(coords.astype(jnp.int32), 8)).astype(np.float32),
    )


@pytest.mark.parametrize("seed", [0, 1])
def test_mxu_warp_equals_gather(rng, seed):
    r = np.random.default_rng(seed)
    img = jnp.asarray(r.uniform(0, 255, (3, 60, 80, 3)).astype(np.float32))
    coords = jnp.asarray(
        np.stack(
            [
                r.uniform(-8, 68, (3, 37, 53)),
                r.uniform(-8, 88, (3, 37, 53)),
            ],
            axis=-1,
        ).astype(np.float32)
    )
    a = np.asarray(bilinear_gather(img, coords))
    b = np.asarray(bilinear_gather_mxu(img, coords))
    np.testing.assert_allclose(a, b, atol=2e-3, rtol=1e-5)


def test_mxu_warp_identity():
    r = np.random.default_rng(2)
    img = jnp.asarray(r.uniform(0, 255, (2, 20, 30, 3)).astype(np.float32))
    ys, xs = np.mgrid[0:20, 0:30].astype(np.float32)
    coords = jnp.asarray(
        np.broadcast_to(np.stack([ys, xs], -1), (2, 20, 30, 2)).copy()
    )
    out = np.asarray(bilinear_gather_mxu(img, coords))
    np.testing.assert_allclose(out, np.asarray(img), atol=1e-3)
