"""Pallas depthwise conv vs lax.conv: forward and gradients (interpreter
mode on CPU; the same kernel compiles for TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_classification_tpu.ops.dwconv import (
    _conv_lax,
    depthwise_conv7x7,
)


@pytest.fixture
def data(rng):
    x = jnp.asarray(rng.normal(size=(2, 12, 14, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(7, 7, 8)).astype(np.float32) * 0.2)
    return x, w


def test_forward_matches_lax(data):
    x, w = data
    ref = _conv_lax(x, w)
    out = depthwise_conv7x7(x, w, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_gradients_match_lax(data):
    x, w = data

    def loss_pallas(x, w):
        return jnp.sum(depthwise_conv7x7(x, w, interpret=True) ** 2)

    def loss_lax(x, w):
        return jnp.sum(_conv_lax(x, w) ** 2)

    gx_p, gw_p = jax.grad(loss_pallas, argnums=(0, 1))(x, w)
    gx_l, gw_l = jax.grad(loss_lax, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_l), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_l), atol=1e-3)


def test_bf16_path(data):
    x, w = data
    out = depthwise_conv7x7(x.astype(jnp.bfloat16), w, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = _conv_lax(x, w)
    np.testing.assert_allclose(
        np.asarray(out).astype(np.float32), np.asarray(ref), atol=0.15, rtol=0.05
    )


def test_non7x7_falls_back(rng):
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 4)).astype(np.float32))
    out = depthwise_conv7x7(x, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_conv_lax(x, w)), atol=1e-5)
