"""EfficientNet timm-checkpoint import: build a timm-style state dict with
the exact shapes timm would produce (derived by reverse-mapping our module
tree), import it, and verify every tensor lands (params AND BatchNorm
running stats) and the model still runs."""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_classification_tpu.models.efficientnet import build_efficientnet
from image_classification_tpu.models.pretrained import import_efficientnet


def un_conv(k):  # flax HWIO -> torch OIHW
    return np.transpose(np.asarray(k), (3, 2, 0, 1))


def make_timm_sd_from(params, batch_stats, num_classes):
    rng = np.random.default_rng(0)

    def rand_like(a):
        return rng.normal(0, 0.05, size=np.asarray(a).shape).astype(np.float32)

    sd = {}

    def bn(t_prefix, p, bs):
        sd[f"{t_prefix}.weight"] = rand_like(p["scale"])
        sd[f"{t_prefix}.bias"] = rand_like(p["bias"])
        sd[f"{t_prefix}.running_mean"] = rand_like(bs["mean"])
        sd[f"{t_prefix}.running_var"] = np.abs(rand_like(bs["var"])) + 0.5

    sd["conv_stem.weight"] = un_conv(rand_like(params["stem_conv"]["kernel"]).transpose(3, 2, 0, 1)).transpose(2, 3, 1, 0).transpose(3, 2, 0, 1)
    sd["conv_stem.weight"] = rng.normal(0, .05, un_conv(params["stem_conv"]["kernel"]).shape).astype(np.float32)
    bn("bn1", params["stem_bn"], batch_stats["stem_bn"])
    sd["conv_head.weight"] = rng.normal(0, .05, un_conv(params["head_conv"]["kernel"]).shape).astype(np.float32)
    bn("bn2", params["head_bn"], batch_stats["head_bn"])
    sd["classifier.weight"] = rng.normal(0, .05, (num_classes, params["classifier"]["kernel"].shape[0])).astype(np.float32)
    sd["classifier.bias"] = rng.normal(0, .05, (num_classes,)).astype(np.float32)

    for name, p in params.items():
        m = re.match(r"stage(\d+)_block(\d+)$", name)
        if not m:
            continue
        s, b = m.groups()
        tp = f"blocks.{s}.{b}"
        bs = batch_stats[name]
        def conv(t_key, our_key):
            sd[t_key] = rng.normal(0, .05, un_conv(p[our_key]["kernel"]).shape).astype(np.float32)
        if "conv_exp" not in p and "conv_pw" not in p and "conv_dw" not in p:
            # fused expand=1 block: timm ConvBnAct
            conv(f"{tp}.conv.weight", "conv_proj")
            bn(f"{tp}.bn1", p["bn_proj"], bs["bn_proj"])
        elif "conv_exp" in p:
            conv(f"{tp}.conv_exp.weight", "conv_exp")
            bn(f"{tp}.bn1", p["bn_exp"], bs["bn_exp"])
            conv(f"{tp}.conv_pwl.weight", "conv_proj")
            bn(f"{tp}.bn2", p["bn_proj"], bs["bn_proj"])
        elif "conv_pw" in p:
            conv(f"{tp}.conv_pw.weight", "conv_pw")
            bn(f"{tp}.bn1", p["bn_pw"], bs["bn_pw"])
            conv(f"{tp}.conv_dw.weight", "conv_dw")
            bn(f"{tp}.bn2", p["bn_dw"], bs["bn_dw"])
            conv(f"{tp}.conv_pwl.weight", "conv_proj")
            bn(f"{tp}.bn3", p["bn_proj"], bs["bn_proj"])
        else:
            conv(f"{tp}.conv_dw.weight", "conv_dw")
            bn(f"{tp}.bn1", p["bn_dw"], bs["bn_dw"])
            conv(f"{tp}.conv_pw.weight", "conv_proj")
            bn(f"{tp}.bn2", p["bn_proj"], bs["bn_proj"])
        if "se" in p:
            sd[f"{tp}.se.conv_reduce.weight"] = rng.normal(0, .05, un_conv(p["se"]["reduce"]["kernel"]).shape).astype(np.float32)
            sd[f"{tp}.se.conv_reduce.bias"] = rng.normal(0, .05, np.asarray(p["se"]["reduce"]["bias"]).shape).astype(np.float32)
            sd[f"{tp}.se.conv_expand.weight"] = rng.normal(0, .05, un_conv(p["se"]["expand"]["kernel"]).shape).astype(np.float32)
            sd[f"{tp}.se.conv_expand.bias"] = rng.normal(0, .05, np.asarray(p["se"]["expand"]["bias"]).shape).astype(np.float32)
    return sd


@pytest.mark.parametrize("name", ["efficientnet_b0", "tf_efficientnetv2_s"])
def test_efficientnet_import_complete(name):
    model = build_efficientnet(name, num_classes=10, dtype=jnp.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    params, batch_stats = variables["params"], variables["batch_stats"]
    sd = make_timm_sd_from(params, batch_stats, 10)
    new_p, new_bs, n = import_efficientnet(sd, params, batch_stats)
    assert n == len(sd), f"mapped {n} of {len(sd)} tensors"
    # spot-check a conv transpose landed
    got = np.asarray(new_p["stem_conv"]["kernel"])
    want = sd["conv_stem.weight"].transpose(2, 3, 1, 0)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # BN stats landed in batch_stats
    np.testing.assert_allclose(
        np.asarray(new_bs["stem_bn"]["mean"]), sd["bn1.running_mean"], rtol=1e-6
    )
    # model runs with imported weights
    out = model.apply(
        {"params": new_p, "batch_stats": new_bs}, jnp.ones((1, 64, 64, 3))
    )
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("name", ["efficientnet_b0", "tf_efficientnetv2_s"])
def test_efficientnet_export_roundtrip(name):
    """export_efficientnet is the exact inverse of import_efficientnet: a
    timm state dict imported then exported reproduces every tensor bitwise
    (params AND BatchNorm running stats) — so foundations trained here are
    consumable by the reference's timm-based scripts."""
    from image_classification_tpu.models.pretrained import export_efficientnet

    model = build_efficientnet(name, num_classes=10, dtype=jnp.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    params, batch_stats = variables["params"], variables["batch_stats"]
    sd = make_timm_sd_from(params, batch_stats, 10)
    new_p, new_bs, n = import_efficientnet(sd, params, batch_stats)
    assert n == len(sd)
    back = export_efficientnet(new_p, new_bs)
    assert set(back.keys()) == set(sd.keys())
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)
