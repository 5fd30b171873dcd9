"""Weight-import parity: a functional *torch* ConvNeXt forward driven by a
timm-style state dict must match our flax model after importing that state
dict. This pins down every layout transpose in models/pretrained.py and the
architecture itself (cites reference `V3.2/train.py:88-114` local-weight
loading semantics)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from image_classification_tpu.models.convnext import ConvNeXt
from image_classification_tpu.models.pretrained import (
    import_convnext,
    import_vit,
    load_checkpoint_into_variables,
    load_state_dict,
)
from image_classification_tpu.models.vit import VisionTransformer

DEPTHS = (1, 1, 2, 1)
DIMS = (8, 16, 24, 32)
NUM_CLASSES = 10


def make_timm_convnext_state_dict(seed=0):
    g = torch.Generator().manual_seed(seed)

    def r(*shape):
        return torch.randn(*shape, generator=g) * 0.1

    sd = {}
    sd["stem.0.weight"] = r(DIMS[0], 3, 4, 4)
    sd["stem.0.bias"] = r(DIMS[0])
    sd["stem.1.weight"] = 1 + 0.1 * r(DIMS[0])
    sd["stem.1.bias"] = r(DIMS[0])
    for i, (depth, dim) in enumerate(zip(DEPTHS, DIMS)):
        if i > 0:
            sd[f"stages.{i}.downsample.0.weight"] = 1 + 0.1 * r(DIMS[i - 1])
            sd[f"stages.{i}.downsample.0.bias"] = r(DIMS[i - 1])
            sd[f"stages.{i}.downsample.1.weight"] = r(dim, DIMS[i - 1], 2, 2)
            sd[f"stages.{i}.downsample.1.bias"] = r(dim)
        for j in range(depth):
            p = f"stages.{i}.blocks.{j}"
            sd[f"{p}.conv_dw.weight"] = r(dim, 1, 7, 7)
            sd[f"{p}.conv_dw.bias"] = r(dim)
            sd[f"{p}.norm.weight"] = 1 + 0.1 * r(dim)
            sd[f"{p}.norm.bias"] = r(dim)
            sd[f"{p}.mlp.fc1.weight"] = r(4 * dim, dim)
            sd[f"{p}.mlp.fc1.bias"] = r(4 * dim)
            sd[f"{p}.mlp.fc2.weight"] = r(dim, 4 * dim)
            sd[f"{p}.mlp.fc2.bias"] = r(dim)
            sd[f"{p}.gamma"] = 1e-2 * (1 + r(dim))
    sd["head.norm.weight"] = 1 + 0.1 * r(DIMS[-1])
    sd["head.norm.bias"] = r(DIMS[-1])
    sd["head.fc.weight"] = r(NUM_CLASSES, DIMS[-1])
    sd["head.fc.bias"] = r(NUM_CLASSES)
    return sd


def torch_convnext_forward(sd, x):
    """Functional timm-ConvNeXt forward (NCHW) from the raw state dict."""

    def ln(h, w, b):  # layernorm over channel dim of NCHW
        h = h.permute(0, 2, 3, 1)
        h = tF.layer_norm(h, (h.shape[-1],), w, b, eps=1e-6)
        return h.permute(0, 3, 1, 2)

    h = tF.conv2d(x, sd["stem.0.weight"], sd["stem.0.bias"], stride=4)
    h = ln(h, sd["stem.1.weight"], sd["stem.1.bias"])
    for i, (depth, dim) in enumerate(zip(DEPTHS, DIMS)):
        if i > 0:
            h = ln(h, sd[f"stages.{i}.downsample.0.weight"],
                   sd[f"stages.{i}.downsample.0.bias"])
            h = tF.conv2d(h, sd[f"stages.{i}.downsample.1.weight"],
                          sd[f"stages.{i}.downsample.1.bias"], stride=2)
        for j in range(depth):
            p = f"stages.{i}.blocks.{j}"
            shortcut = h
            h2 = tF.conv2d(h, sd[f"{p}.conv_dw.weight"], sd[f"{p}.conv_dw.bias"],
                           padding=3, groups=dim)
            h2 = h2.permute(0, 2, 3, 1)
            h2 = tF.layer_norm(h2, (dim,), sd[f"{p}.norm.weight"],
                               sd[f"{p}.norm.bias"], eps=1e-6)
            h2 = tF.linear(h2, sd[f"{p}.mlp.fc1.weight"], sd[f"{p}.mlp.fc1.bias"])
            h2 = tF.gelu(h2)
            h2 = tF.linear(h2, sd[f"{p}.mlp.fc2.weight"], sd[f"{p}.mlp.fc2.bias"])
            h2 = h2 * sd[f"{p}.gamma"]
            h = shortcut + h2.permute(0, 3, 1, 2)
    h = h.mean(dim=(2, 3))
    h = tF.layer_norm(h, (DIMS[-1],), sd["head.norm.weight"],
                      sd["head.norm.bias"], eps=1e-6)
    return tF.linear(h, sd["head.fc.weight"], sd["head.fc.bias"])


def test_convnext_import_forward_parity():
    sd = make_timm_convnext_state_dict()
    x = torch.randn(2, 3, 32, 32, generator=torch.Generator().manual_seed(1))
    ref = torch_convnext_forward(sd, x).detach().numpy()

    model = ConvNeXt(num_classes=NUM_CLASSES, depths=DEPTHS, dims=DIMS,
                     dtype=jnp.float32)
    x_jax = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    variables = model.init(jax.random.key(0), x_jax)
    sd_np = {k: v.numpy() for k, v in sd.items()}
    new_params, n = import_convnext(sd_np, variables["params"])
    assert n == len(sd)  # every tensor mapped
    out = model.apply({"params": new_params}, x_jax)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)


def test_convnext_import_classifier_strip():
    """Mismatched head shapes are skipped (strict=False semantics)."""
    sd = make_timm_convnext_state_dict()
    sd["head.fc.weight"] = torch.randn(1000, DIMS[-1])
    sd["head.fc.bias"] = torch.randn(1000)
    model = ConvNeXt(num_classes=NUM_CLASSES, depths=DEPTHS, dims=DIMS,
                     dtype=jnp.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    sd_np = {k: v.numpy() for k, v in sd.items()}
    new_params, n = import_convnext(sd_np, variables["params"])
    assert n == len(sd) - 2
    # head unchanged (random init preserved)
    np.testing.assert_array_equal(
        np.asarray(new_params["head_fc"]["kernel"]),
        np.asarray(variables["params"]["head_fc"]["kernel"]),
    )


def test_load_checkpoint_file_with_nesting(tmp_path):
    """torch .pth with model_state_dict nesting (`testdata.py:152-155`)."""
    sd = make_timm_convnext_state_dict()
    path = tmp_path / "ckpt.pth"
    torch.save({"model_state_dict": sd, "val_acc": 0.9, "fold": 1}, path)
    model = ConvNeXt(num_classes=NUM_CLASSES, depths=DEPTHS, dims=DIMS,
                     dtype=jnp.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    out = load_checkpoint_into_variables(str(path), variables, "convnext_custom")
    got = np.asarray(out["params"]["stem_conv"]["kernel"])
    want = sd["stem.0.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_load_checkpoint_strip_head(tmp_path):
    """``strip_head=True`` drops the checkpoint's classifier even when its
    shape matches the target (`V3.2/train.py:100-106` semantics): the
    fresh head survives, everything else imports."""
    sd = make_timm_convnext_state_dict()
    path = tmp_path / "ckpt.pth"
    torch.save({"model_state_dict": sd}, path)
    model = ConvNeXt(num_classes=NUM_CLASSES, depths=DEPTHS, dims=DIMS,
                     dtype=jnp.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    out = load_checkpoint_into_variables(
        str(path), variables, "convnext_custom", strip_head=True
    )
    # head untouched (fresh init preserved)
    np.testing.assert_array_equal(
        np.asarray(out["params"]["head_fc"]["kernel"]),
        np.asarray(variables["params"]["head_fc"]["kernel"]),
    )
    # backbone imported
    got = np.asarray(out["params"]["stem_conv"]["kernel"])
    want = sd["stem.0.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_vit_import_attention_parity():
    """The split of timm's fused qkv must reproduce torch's attention."""
    dim, heads, n_tok = 32, 4, 5
    g = torch.Generator().manual_seed(0)
    qkv_w = torch.randn(3 * dim, dim, generator=g) * 0.1
    qkv_b = torch.randn(3 * dim, generator=g) * 0.1
    proj_w = torch.randn(dim, dim, generator=g) * 0.1
    proj_b = torch.randn(dim, generator=g) * 0.1
    x = torch.randn(2, n_tok, dim, generator=g)

    # torch reference attention
    qkv = tF.linear(x, qkv_w, qkv_b).reshape(2, n_tok, 3, heads, dim // heads)
    q, k, v = qkv.permute(2, 0, 3, 1, 4)
    attn = (q @ k.transpose(-2, -1)) / (dim // heads) ** 0.5
    attn = attn.softmax(dim=-1)
    ref = (attn @ v).transpose(1, 2).reshape(2, n_tok, dim)
    ref = tF.linear(ref, proj_w, proj_b).detach().numpy()

    # flax side: single attention layer via VisionTransformer block import
    import flax.linen as nn

    layer = nn.MultiHeadDotProductAttention(num_heads=heads, dtype=jnp.float32)
    xj = jnp.asarray(x.numpy())
    variables = layer.init(jax.random.key(0), xj, xj)
    p = variables["params"]
    hd = dim // heads
    qw, kw, vw = np.split(qkv_w.numpy().T, 3, axis=1)
    qb, kb, vb = np.split(qkv_b.numpy(), 3)
    p["query"]["kernel"] = jnp.asarray(qw.reshape(dim, heads, hd))
    p["key"]["kernel"] = jnp.asarray(kw.reshape(dim, heads, hd))
    p["value"]["kernel"] = jnp.asarray(vw.reshape(dim, heads, hd))
    p["query"]["bias"] = jnp.asarray(qb.reshape(heads, hd))
    p["key"]["bias"] = jnp.asarray(kb.reshape(heads, hd))
    p["value"]["bias"] = jnp.asarray(vb.reshape(heads, hd))
    p["out"]["kernel"] = jnp.asarray(proj_w.numpy().T.reshape(heads, hd, dim))
    p["out"]["bias"] = jnp.asarray(proj_b.numpy())
    out = layer.apply({"params": p}, xj, xj)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_vit_full_import_runs():
    m = VisionTransformer(num_classes=NUM_CLASSES, patch=8, dim=32, depth=2,
                          heads=4, dtype=jnp.float32)
    x = jnp.zeros((1, 32, 32, 3))
    variables = m.init(jax.random.key(0), x)
    g = torch.Generator().manual_seed(0)
    n_tok = (32 // 8) ** 2 + 1
    sd = {
        "cls_token": torch.randn(1, 1, 32, generator=g).numpy(),
        "pos_embed": torch.randn(1, n_tok, 32, generator=g).numpy(),
        "patch_embed.proj.weight": torch.randn(32, 3, 8, 8, generator=g).numpy(),
        "patch_embed.proj.bias": torch.randn(32, generator=g).numpy(),
        "norm.weight": torch.randn(32, generator=g).numpy(),
        "norm.bias": torch.randn(32, generator=g).numpy(),
        "head.weight": torch.randn(NUM_CLASSES, 32, generator=g).numpy(),
        "head.bias": torch.randn(NUM_CLASSES, generator=g).numpy(),
    }
    for i in range(2):
        sd.update({
            f"blocks.{i}.norm1.weight": np.ones(32, np.float32),
            f"blocks.{i}.norm1.bias": np.zeros(32, np.float32),
            f"blocks.{i}.attn.qkv.weight": torch.randn(96, 32, generator=g).numpy(),
            f"blocks.{i}.attn.qkv.bias": torch.randn(96, generator=g).numpy(),
            f"blocks.{i}.attn.proj.weight": torch.randn(32, 32, generator=g).numpy(),
            f"blocks.{i}.attn.proj.bias": torch.randn(32, generator=g).numpy(),
            f"blocks.{i}.norm2.weight": np.ones(32, np.float32),
            f"blocks.{i}.norm2.bias": np.zeros(32, np.float32),
            f"blocks.{i}.mlp.fc1.weight": torch.randn(128, 32, generator=g).numpy(),
            f"blocks.{i}.mlp.fc1.bias": torch.randn(128, generator=g).numpy(),
            f"blocks.{i}.mlp.fc2.weight": torch.randn(32, 128, generator=g).numpy(),
            f"blocks.{i}.mlp.fc2.bias": torch.randn(32, generator=g).numpy(),
        })
    new_params, n = import_vit(sd, variables["params"])
    # each fused qkv weight/bias expands into 3 per-head tensors (2 blocks x
    # 2 tensors x 2 extra puts = 8 more than the raw key count)
    assert n == len(sd) + 8
    out = m.apply({"params": new_params}, x)
    assert np.isfinite(np.asarray(out)).all()


def test_convnext_export_roundtrip():
    """export_convnext is the exact inverse of import_convnext: a timm
    state dict imported then exported reproduces every tensor bitwise."""
    from image_classification_tpu.models.pretrained import export_convnext

    sd = make_timm_convnext_state_dict(seed=3)
    model = ConvNeXt(num_classes=NUM_CLASSES, depths=DEPTHS, dims=DIMS,
                     dtype=jnp.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    sd_np = {k: v.numpy() for k, v in sd.items()}
    params, n = import_convnext(sd_np, variables["params"])
    assert n == len(sd)
    back = export_convnext(params, DEPTHS, DIMS)
    assert set(back.keys()) == set(sd_np.keys())
    for k in sd_np:
        np.testing.assert_array_equal(back[k], sd_np[k], err_msg=k)
