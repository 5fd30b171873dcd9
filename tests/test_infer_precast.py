"""bf16 inference-param pre-cast must not change predictions.

With ``compute_dtype=bfloat16`` flax casts f32 params to bf16 inside every
layer anyway, so the one-time pre-cast (infer/predict.py
``_cast_inference_params``) is a pure HBM-traffic optimization — this pins
that the probabilities are bit-identical with and without it, and that
float32 inference is left untouched.
"""

import numpy as np

import jax
import jax.numpy as jnp

from image_classification_tpu.core.config import Config
from image_classification_tpu.infer.predict import _cast_inference_params
from image_classification_tpu.models.factory import create_model
from image_classification_tpu.train.step import make_predict_step


def _setup(compute_dtype):
    cfg = Config(
        model_name="convnext_atto",
        num_classes=6,
        native_size=(24, 32),
        image_size=(32, 32),
        compute_dtype=compute_dtype,
        tta_transforms=0,
    )
    bundle = create_model(cfg)
    variables = bundle.init(jax.random.key(0))
    return cfg, bundle, variables


def test_precast_bitwise_identical_bf16():
    cfg, bundle, variables = _setup("bfloat16")
    cast = _cast_inference_params(variables, cfg)
    # every f32 matmul/conv kernel became bf16; 1-D leaves (LN scale/bias)
    # stay f32 — the fused ops run LN statistics in f32
    import jax.tree_util as jtu

    for path, leaf in jtu.tree_flatten_with_path(cast)[0]:
        if hasattr(leaf, "dtype") and leaf.dtype == jnp.float32:
            name = jtu.keystr(path)
            assert leaf.ndim < 2 or "head_fc" in name or "aux_head" in name
    images = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, size=(4, 24, 32, 3)),
        jnp.uint8,
    )
    step = jax.jit(make_predict_step(bundle, cfg))
    p_master = np.asarray(step(variables, images))
    p_cast = np.asarray(step(cast, images))
    np.testing.assert_array_equal(p_master, p_cast)


def test_precast_noop_for_f32_and_when_disabled():
    cfg, _, variables = _setup("float32")
    out = _cast_inference_params(variables, cfg)
    assert out is variables

    cfg_b, _, variables_b = _setup("bfloat16")
    out_b = _cast_inference_params(
        variables_b, cfg_b.replace(infer_cast_params=False)
    )
    assert out_b is variables_b
