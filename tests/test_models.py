import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_classification_tpu.core.config import Config
from image_classification_tpu.models import (
    ConvNeXt,
    DeepSupervisionModel,
    EfficientNet,
    VisionTransformer,
    create_model,
    list_models,
)
from image_classification_tpu.models.efficientnet import build_efficientnet
from image_classification_tpu.models.vit import build_vit


def small_convnext(**kw):
    kw.setdefault("num_classes", 10)
    kw.setdefault("depths", (1, 1, 1, 1))
    kw.setdefault("dims", (8, 16, 24, 32))
    kw.setdefault("dtype", jnp.float32)
    return ConvNeXt(**kw)


def test_convnext_forward_shape():
    m = small_convnext()
    x = jnp.zeros((2, 32, 32, 3))
    variables = m.init(jax.random.key(0), x)
    out = m.apply(variables, x)
    assert out.shape == (2, 10)
    logits, feats = m.apply(variables, x, return_features=True)
    assert len(feats) == 3
    assert feats[0].shape == (2, 4, 4, 16)
    assert feats[2].shape == (2, 1, 1, 32)


def test_deep_supervision_outputs():
    backbone = small_convnext()
    m = DeepSupervisionModel(backbone=backbone, num_classes=10)
    x = jnp.zeros((2, 32, 32, 3))
    variables = m.init(jax.random.key(0), x)
    outs = m.apply(variables, x)
    assert isinstance(outs, tuple) and len(outs) == 4
    for o in outs:
        assert o.shape == (2, 10)


def test_vit_forward():
    m = VisionTransformer(
        num_classes=10, patch=8, dim=32, depth=2, heads=2, dtype=jnp.float32
    )
    x = jnp.zeros((2, 32, 32, 3))
    variables = m.init(jax.random.key(0), x)
    out = m.apply(variables, x)
    assert out.shape == (2, 10)


def test_efficientnet_forward_and_batchstats():
    m = build_efficientnet("efficientnet_b0", num_classes=10, dtype=jnp.float32)
    x = jnp.zeros((2, 64, 64, 3))
    variables = m.init(jax.random.key(0), x)
    assert "batch_stats" in variables
    out = m.apply(variables, x)
    assert out.shape == (2, 10)
    out, updates = m.apply(
        variables, x, deterministic=False, mutable=["batch_stats"],
        rngs={"dropout": jax.random.key(1)},
    )
    assert "batch_stats" in updates


def test_efficientnetv2_s_builds():
    m = build_efficientnet("tf_efficientnetv2_s_in21ft1k", num_classes=10,
                           dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    variables = m.init(jax.random.key(0), x)
    assert m.apply(variables, x).shape == (1, 10)


def test_factory_reference_names():
    cfg = Config(image_size=(64, 64), use_deep_supervision=False)
    for name in [
        "convnext_tiny",
        "efficientnet_b0",
        "vit_tiny_patch16_224",
        "deit_tiny_patch16_224",
        "tf_efficientnetv2_s_in21ft1k",
        "convnext_base_in22k",
        "vit_base_patch16_224.augreg_in21k",
    ]:
        b = create_model(cfg, name)
        assert b.module is not None


def test_factory_deep_supervision_wrap():
    cfg = Config(image_size=(32, 32), model_name="convnext_tiny",
                 use_deep_supervision=True)
    b = create_model(cfg)
    assert b.deep_supervised
    variables = b.init(jax.random.key(0))
    outs = b.apply(variables, jnp.zeros((1, 32, 32, 3)))
    assert len(outs) == 4


def test_list_models_nonempty():
    names = list_models()
    assert "convnext_base" in names and "efficientnet_b0" in names


def test_drop_path_train_vs_eval():
    m = small_convnext(drop_path_rate=0.5)
    x = jnp.ones((4, 32, 32, 3))
    variables = m.init(jax.random.key(0), x)
    det = m.apply(variables, x, deterministic=True)
    r1 = m.apply(variables, x, deterministic=False,
                 rngs={"dropout": jax.random.key(1)})
    r2 = m.apply(variables, x, deterministic=False,
                 rngs={"dropout": jax.random.key(2)})
    assert not np.allclose(np.asarray(r1), np.asarray(r2))
    assert np.isfinite(np.asarray(det)).all()


def test_pin_layout_matches():
    """pin_layout only constrains layouts. On TPU the result is
    bit-identical (verified on hardware); on CPU the constraint acts as a
    fusion barrier and reorders reductions, so compare to f32 tolerance."""
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 3)),
                    jnp.float32)
    outs = []
    for pin in (False, True):
        m = small_convnext(pin_layout=pin, mlp_2d=True)
        variables = m.init(jax.random.key(0), x)
        outs.append(np.asarray(jax.jit(m.apply)(variables, x)))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-4, atol=1e-4)


def test_block_remat_matches():
    """block_remat only changes what is saved for the backward pass: loss
    and gradients must match the non-remat graph."""
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 32, 32, 3)),
                    jnp.float32)
    results = {}
    for remat in ("none", "dots", "full"):
        m = small_convnext(block_remat=remat, mlp_2d=True)
        variables = m.init(jax.random.key(0), x)

        def loss(v):
            return jnp.sum(m.apply(v, x) ** 2)

        l, g = jax.value_and_grad(loss)(variables)
        results[remat] = (float(l), g)
    for remat in ("dots", "full"):
        assert np.isclose(results["none"][0], results[remat][0], rtol=1e-6)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5),
            results["none"][1], results[remat][1],
        )


def test_dwconv_impl_pallas_parity():
    """dwconv_impl='pallas' keeps nn.Conv's exact parameter tree (checkpoint
    compatible) and forward semantics (lax fallback off-TPU)."""
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 32, 32, 3)),
                    jnp.float32)
    vs, outs = {}, {}
    for impl in ("conv", "pallas"):
        m = small_convnext(dwconv_impl=impl, mlp_2d=True)
        v = m.init(jax.random.key(0), x)
        vs[impl], outs[impl] = v, np.asarray(m.apply(v, x))
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                 vs["conv"], vs["pallas"])
    np.testing.assert_allclose(outs["conv"], outs["pallas"], rtol=2e-5, atol=2e-5)


def test_patch_conv_p2_matches_lax_conv_same():
    """The P=2 W-fold + H-interleave + matmul lowering (layers.patch_conv)
    must match lax conv with SAME padding exactly — value AND gradients —
    on both even and odd spatial sizes (ConvNeXt downsamples see 65/33/17).
    Reference semantics: the 2x2/2 stage downsample of timm ConvNeXt
    (`train_advanced_v4.py:484-502` model factory)."""
    from image_classification_tpu.models.layers import patch_conv

    rng = np.random.default_rng(7)
    for H, W in ((8, 8), (7, 9), (17, 17), (5, 4)):
        x = jnp.asarray(rng.normal(size=(2, H, W, 6)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(2, 2, 6, 10)).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.normal(size=(10,)).astype(np.float32))

        def ref(x, k, b):
            out = jax.lax.conv_general_dilated(
                x, k, (2, 2), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return out + b

        got = patch_conv(x, k, b, 2)
        want = ref(x, k, b)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )
        # gradient parity (the conv's backward includes the pad-scatter)
        g1 = jax.grad(lambda *a: jnp.sum(patch_conv(*a, 2) ** 2), argnums=(0, 1, 2))(x, k, b)
        g2 = jax.grad(lambda *a: jnp.sum(ref(*a) ** 2), argnums=(0, 1, 2))(x, k, b)
        for a, w in zip(g1, g2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(w), rtol=1e-4, atol=1e-4
            )


def test_downsample_impl_matmul_matches_conv():
    """downsample_impl='matmul' must produce the same ConvNeXt outputs as
    the nn.Conv path (identical params)."""
    from image_classification_tpu.models.convnext import build_convnext

    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(2, 34, 34, 3)).astype(np.float32)
    )
    outs = {}
    vs = {}
    for impl in ("conv", "matmul"):
        m = build_convnext(
            "convnext_atto", 7, dtype=jnp.float32, downsample_impl=impl
        )
        v = m.init(jax.random.key(0), x)
        vs[impl] = v
        outs[impl] = np.asarray(m.apply(v, x))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(a, b), vs["conv"], vs["matmul"]
    )
    np.testing.assert_allclose(outs["conv"], outs["matmul"], rtol=2e-5, atol=2e-5)
