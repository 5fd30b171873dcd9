"""Fused block-MLP Pallas kernel (ops/block_mlp.py): forward and custom-VJP
gradients vs the plain-JAX formulation of the ConvNeXt block tail
(models/convnext.py LN->fc1->GELU->fc2->gamma->residual)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_classification_tpu.ops.block_mlp import block_mlp

EPS = 1e-6


def ref_block(x, res, s, t, w1, b1, w2, b2, g):
    """Reference math mirroring the kernel's dtype policy (f32 stats +
    accumulation, x.dtype matmul inputs)."""
    f32 = jnp.float32
    xf = x.astype(f32)
    mu = xf.mean(1, keepdims=True)
    var = (xf * xf).mean(1, keepdims=True) - mu * mu
    z = (xf - mu) * jax.lax.rsqrt(var + EPS)
    xhat = (z * s.astype(f32) + t.astype(f32)).astype(x.dtype)
    a = jnp.dot(xhat, w1.astype(x.dtype), preferred_element_type=f32)
    a = a + b1.astype(f32)
    h = jax.nn.gelu(a, approximate=False)
    u = jnp.dot(h.astype(x.dtype), w2.astype(x.dtype),
                preferred_element_type=f32) + b2.astype(f32)
    return (res.astype(f32) + g.astype(f32) * u).astype(x.dtype)


def make_inputs(m, c, dtype, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(m, c)).astype(np.float32)
    res = rng.normal(size=(m, c)).astype(np.float32)
    s = rng.normal(1.0, 0.1, size=(c,)).astype(np.float32)
    t = rng.normal(0.0, 0.1, size=(c,)).astype(np.float32)
    w1 = (rng.normal(size=(c, 4 * c)) / np.sqrt(c)).astype(np.float32)
    b1 = rng.normal(0.0, 0.02, size=(4 * c,)).astype(np.float32)
    w2 = (rng.normal(size=(4 * c, c)) / np.sqrt(4 * c)).astype(np.float32)
    b2 = rng.normal(0.0, 0.02, size=(c,)).astype(np.float32)
    g = rng.normal(0.2, 0.05, size=(c,)).astype(np.float32)
    return (jnp.asarray(x, dtype), jnp.asarray(res, dtype), jnp.asarray(s), jnp.asarray(t),
            jnp.asarray(w1), jnp.asarray(b1), jnp.asarray(w2),
            jnp.asarray(b2), jnp.asarray(g))


@pytest.mark.parametrize("m,c,tm", [(384, 128, 128), (300, 256, 128)])
def test_forward_matches_reference_f32(m, c, tm):
    args = make_inputs(m, c, jnp.float32)
    out = block_mlp(*args, EPS, tm, True)
    ref = ref_block(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_forward_bf16_close_to_f32_reference():
    args32 = make_inputs(256, 128, jnp.float32, seed=1)
    ref = ref_block(*args32)
    args16 = (args32[0].astype(jnp.bfloat16), args32[1].astype(jnp.bfloat16)) + args32[2:]
    out = block_mlp(*args16, EPS, 128, True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=0.03, atol=0.03
    )


def test_gradients_match_reference():
    args = make_inputs(320, 128, jnp.float32, seed=2)  # 320 = padding case
    cot = jnp.asarray(
        np.random.default_rng(3).normal(size=(320, 128)).astype(np.float32)
    )

    def loss_k(*a):
        return jnp.sum(block_mlp(*a, EPS, 128, True) * cot)

    def loss_r(*a):
        return jnp.sum(ref_block(*a) * cot)

    gk = jax.grad(loss_k, argnums=tuple(range(9)))(*args)
    gr = jax.grad(loss_r, argnums=tuple(range(9)))(*args)
    names = ["x", "res", "s", "t", "w1", "b1", "w2", "b2", "g"]
    for n, a, b in zip(names, gk, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch for {n}",
        )


def test_padding_rows_do_not_leak():
    """M not divisible by TM: padded rows must not affect outputs/grads."""
    args = make_inputs(200, 128, jnp.float32, seed=4)
    out = block_mlp(*args, EPS, 128, True)
    ref = ref_block(*args)
    assert out.shape == (200, 128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_wide_c_forward_and_grads():
    """C=1024 (ConvNeXt stage 3, IC_TPU_BLOCKMLP_MAXC=1024 gate): the kernel
    math must hold at the wide width too (small M keeps interpret cheap)."""
    args = make_inputs(64, 1024, jnp.float32, seed=6)
    out = block_mlp(*args, EPS, 32, True)
    ref = ref_block(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    cot = jnp.asarray(
        np.random.default_rng(7).normal(size=(64, 1024)).astype(np.float32)
    )
    gk = jax.grad(lambda *a: jnp.sum(block_mlp(*a, EPS, 32, True) * cot),
                  argnums=(0, 4, 6))(*args)
    gr = jax.grad(lambda *a: jnp.sum(ref_block(*a) * cot),
                  argnums=(0, 4, 6))(*args)
    for n, a, b in zip(["x", "w1", "w2"], gk, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4,
            err_msg=f"grad mismatch for {n}",
        )


def test_pick_tm():
    from image_classification_tpu.ops.block_mlp import pick_tm

    # exact divisors of the ConvNeXt-B @260 batch-32 row counts
    assert pick_tm(135200) == 520 and 135200 % 520 == 0
    assert pick_tm(34848) == 528 and 34848 % 528 == 0
    assert pick_tm(9248) == 544
    # wide-C halves the target/cap (VMEM pressure from (TM, 4C) temps)
    tm_wide = pick_tm(2592, c=1024)
    assert 2592 % tm_wide == 0 and tm_wide <= 384
    # prime-ish m with no 8-multiple divisor falls back to the target
    assert pick_tm(1006) == 512


def test_model_integration_matches_xla_path(monkeypatch):
    """Full ConvNeXt with block_mlp_impl='pallas' (interpret mode) must match
    the flax path on identical params: same param tree, same forward, same
    grads."""
    monkeypatch.setenv("IC_TPU_BLOCKMLP_INTERPRET", "1")
    from image_classification_tpu.core.config import Config
    from image_classification_tpu.models.factory import create_model

    cfg = Config(
        model_name="convnext_atto", num_classes=6, image_size=(32, 32),
        use_deep_supervision=False, compute_dtype="float32",
    ).validate()
    b_xla = create_model(cfg.replace(block_mlp_impl="xla"))
    b_pal = create_model(cfg.replace(block_mlp_impl="pallas"))
    v = b_xla.init(jax.random.key(0))
    v2 = b_pal.init(jax.random.key(0))
    assert jax.tree.structure(v) == jax.tree.structure(v2)

    x = jnp.asarray(
        np.random.default_rng(5).normal(size=(2, 32, 32, 3)).astype(np.float32)
    )

    def fwd(module, variables):
        return module.apply(variables, x, deterministic=True)

    o1 = fwd(b_xla.module, v)
    o2 = fwd(b_pal.module, v)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=2e-4, atol=2e-4)

    def loss(params, module):
        out = module.apply({"params": params}, x, deterministic=True)
        return jnp.sum(out ** 2)

    g1 = jax.grad(loss)(v["params"], b_xla.module)
    g2 = jax.grad(loss)(v2["params"], b_pal.module)
    flat1 = jax.tree.leaves_with_path(g1)
    flat2 = {jax.tree_util.keystr(k): a for k, a in jax.tree.leaves_with_path(g2)}
    for k, a in flat1:
        b = flat2[jax.tree_util.keystr(k)]
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(k)}",
        )
