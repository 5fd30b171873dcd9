"""Local checkpoint import: timm/torch state dicts -> flax parameter trees.

Replaces the reference's pretrained-weight path. Since no download path
exists, weights come from *files* (``.pth``/``.pt`` via torch, or
``.safetensors``), exactly like the reference's local-weights flow
(`V3.2/train.py:88-114`): unwrap nested ``model_state_dict``/``state_dict``
(`testdata.py:152-155`), remap keys per-architecture, drop classifier keys
whose shapes do not match the target (``strict=False`` + classifier-strip
semantics, `V3.1/train_advanced_v3.2.py:363-396`).

Supported mappings: ConvNeXt (timm naming), ViT/DeiT (timm naming).
"""

from __future__ import annotations

import logging
import os
import re
from typing import Callable

import jax.numpy as jnp
import numpy as np

logger = logging.getLogger("ic_tpu")


# --------------------------------------------------------------------------
# raw state-dict loading
# --------------------------------------------------------------------------

def load_state_dict(path: str) -> dict[str, np.ndarray]:
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    for wrap in ("model_state_dict", "state_dict", "model"):
        if isinstance(obj, dict) and wrap in obj and isinstance(obj[wrap], dict):
            obj = obj[wrap]
    return {k: np.asarray(v.detach().numpy() if hasattr(v, "detach") else v)
            for k, v in obj.items()}


def _t_conv(w: np.ndarray) -> np.ndarray:
    """torch OIHW -> flax HWIO (also correct for depthwise (C,1,kh,kw))."""
    return np.transpose(w, (2, 3, 1, 0))


def _t_linear(w: np.ndarray) -> np.ndarray:
    """torch (out, in) -> flax (in, out)."""
    return np.transpose(w, (1, 0))


# --------------------------------------------------------------------------
# ConvNeXt: timm keys -> our flax tree
# --------------------------------------------------------------------------

def convnext_key_map(torch_keys: list[str]) -> dict[str, tuple[tuple[str, ...], Callable]]:
    """Map each timm ConvNeXt tensor to (flax path, converter)."""
    out: dict[str, tuple[tuple[str, ...], Callable]] = {}
    for k in torch_keys:
        m: tuple[tuple[str, ...], Callable] | None = None
        if k == "stem.0.weight":
            m = (("stem_conv", "kernel"), _t_conv)
        elif k == "stem.0.bias":
            m = (("stem_conv", "bias"), lambda x: x)
        elif k == "stem.1.weight":
            m = (("stem_norm", "scale"), lambda x: x)
        elif k == "stem.1.bias":
            m = (("stem_norm", "bias"), lambda x: x)
        elif k == "head.norm.weight":
            m = (("head_norm", "scale"), lambda x: x)
        elif k == "head.norm.bias":
            m = (("head_norm", "bias"), lambda x: x)
        elif k == "head.fc.weight":
            m = (("head_fc", "kernel"), _t_linear)
        elif k == "head.fc.bias":
            m = (("head_fc", "bias"), lambda x: x)
        else:
            ds = re.match(r"stages\.(\d+)\.downsample\.(\d+)\.(weight|bias)$", k)
            blk = re.match(
                r"stages\.(\d+)\.blocks\.(\d+)\.([\w.]+)\.(weight|bias)$", k
            )
            gamma = re.match(r"stages\.(\d+)\.blocks\.(\d+)\.gamma$", k)
            if ds:
                i, which, wb = int(ds.group(1)), int(ds.group(2)), ds.group(3)
                if which == 0:
                    m = ((f"downsample{i}_norm", "scale" if wb == "weight" else "bias"),
                         lambda x: x)
                else:
                    m = ((f"downsample{i}_conv", "kernel" if wb == "weight" else "bias"),
                         _t_conv if wb == "weight" else (lambda x: x))
            elif gamma:
                i, j = int(gamma.group(1)), int(gamma.group(2))
                m = ((f"stage{i}_block{j}", "gamma"), lambda x: x)
            elif blk:
                i, j, inner, wb = (
                    int(blk.group(1)), int(blk.group(2)), blk.group(3), blk.group(4),
                )
                inner_map = {
                    "conv_dw": ("conv_dw", _t_conv, "kernel"),
                    "dwconv": ("conv_dw", _t_conv, "kernel"),
                    "norm": ("norm", lambda x: x, "scale"),
                    "mlp.fc1": ("mlp_fc1", _t_linear, "kernel"),
                    "mlp.fc2": ("mlp_fc2", _t_linear, "kernel"),
                }
                if inner in inner_map:
                    mod, conv, wname = inner_map[inner]
                    if wb == "weight":
                        m = ((f"stage{i}_block{j}", mod, wname), conv)
                    else:
                        m = ((f"stage{i}_block{j}", mod, "bias"), lambda x: x)
        if m is not None:
            # nest block-level paths one deeper
            path, conv = m
            if path[0].startswith("stage") and len(path) == 3:
                pass
            out[k] = (path, conv)
    return out


# --------------------------------------------------------------------------
# ViT / DeiT: timm keys -> our flax tree (splits fused qkv)
# --------------------------------------------------------------------------

def import_vit(sd: dict[str, np.ndarray], params: dict) -> tuple[dict, int]:
    """In-place-style import into a copied ViT params tree; returns
    (new params, n loaded)."""
    import copy

    new = copy.deepcopy(params)
    n = 0

    def put(path: tuple[str, ...], val: np.ndarray) -> bool:
        node = new
        for p in path[:-1]:
            if p not in node:
                return False
            node = node[p]
        leaf = path[-1]
        if leaf not in node:
            return False
        if tuple(node[leaf].shape) != tuple(val.shape):
            logger.warning("skip %s: shape %s vs %s", "/".join(path),
                           node[leaf].shape, val.shape)
            return False
        node[leaf] = jnp.asarray(val, dtype=node[leaf].dtype)
        return True

    simple = {
        "cls_token": ("cls_token",),
        "pos_embed": ("pos_embed",),
        "patch_embed.proj.weight": ("patch_embed", "kernel"),
        "patch_embed.proj.bias": ("patch_embed", "bias"),
        "norm.weight": ("norm", "scale"),
        "norm.bias": ("norm", "bias"),
        "head.weight": ("head", "kernel"),
        "head.bias": ("head", "bias"),
    }
    for k, v in sd.items():
        if k in simple:
            val = v
            if k.endswith("proj.weight"):
                val = _t_conv(v)
            elif k == "head.weight":
                val = _t_linear(v)
            n += put(simple[k], val)
            continue
        m = re.match(r"blocks\.(\d+)\.(.+)$", k)
        if not m:
            continue
        i, rest = int(m.group(1)), m.group(2)
        blk = f"block{i}"
        if rest == "attn.qkv.weight":
            dim = v.shape[1]
            heads = new[blk]["attn"]["query"]["kernel"].shape[1]
            hd = dim // heads
            q, kk, vv = np.split(_t_linear(v), 3, axis=1)  # (in, dim) each
            for name, mat in (("query", q), ("key", kk), ("value", vv)):
                n += put((blk, "attn", name, "kernel"),
                         mat.reshape(dim, heads, hd))
        elif rest == "attn.qkv.bias":
            dim = v.shape[0] // 3
            heads = new[blk]["attn"]["query"]["kernel"].shape[1]
            hd = dim // heads
            q, kk, vv = np.split(v, 3)
            for name, vec in (("query", q), ("key", kk), ("value", vv)):
                n += put((blk, "attn", name, "bias"), vec.reshape(heads, hd))
        elif rest == "attn.proj.weight":
            dim = v.shape[0]
            heads = new[blk]["attn"]["query"]["kernel"].shape[1]
            hd = dim // heads
            n += put((blk, "attn", "out", "kernel"),
                     _t_linear(v).reshape(heads, hd, dim))
        elif rest == "attn.proj.bias":
            n += put((blk, "attn", "out", "bias"), v)
        else:
            inner = {
                "norm1.weight": ("norm1", "scale"), "norm1.bias": ("norm1", "bias"),
                "norm2.weight": ("norm2", "scale"), "norm2.bias": ("norm2", "bias"),
                "mlp.fc1.weight": ("mlp_fc1", "kernel"),
                "mlp.fc1.bias": ("mlp_fc1", "bias"),
                "mlp.fc2.weight": ("mlp_fc2", "kernel"),
                "mlp.fc2.bias": ("mlp_fc2", "bias"),
            }
            if rest in inner:
                val = _t_linear(v) if rest.endswith("weight") and "mlp" in rest else v
                n += put((blk,) + inner[rest], val)
    return new, n


def import_convnext(sd: dict[str, np.ndarray], params: dict) -> tuple[dict, int]:
    import copy

    new = copy.deepcopy(params)
    keymap = convnext_key_map(list(sd.keys()))
    n = 0
    for tk, (path, conv) in keymap.items():
        node = new
        ok = True
        for p in path[:-1]:
            if p not in node:
                ok = False
                break
            node = node[p]
        if not ok or path[-1] not in node:
            continue
        val = conv(sd[tk])
        if tuple(node[path[-1]].shape) != tuple(val.shape):
            logger.warning(
                "skip %s -> %s: shape %s vs %s (classifier-strip semantics)",
                tk, "/".join(path), val.shape, node[path[-1]].shape,
            )
            continue
        node[path[-1]] = jnp.asarray(val, dtype=node[path[-1]].dtype)
        n += 1
    return new, n


def import_efficientnet(
    sd: dict[str, np.ndarray], params: dict, batch_stats: dict
) -> tuple[dict, dict, int]:
    """timm efficientnet_* / tf_efficientnetv2_* keys -> our flax trees.

    timm block forms map as:
    - DepthwiseSeparableConv (expand==1): conv_dw/bn1, conv_pw/bn2
      -> conv_dw/bn_dw, conv_proj/bn_proj
    - InvertedResidual: conv_pw/bn1, conv_dw/bn2, conv_pwl/bn3
      -> conv_pw/bn_pw, conv_dw/bn_dw, conv_proj/bn_proj
    - EdgeResidual (fused, V2): conv_exp/bn1, conv_pwl/bn2
      -> conv_exp/bn_exp, conv_proj/bn_proj
    - se.conv_reduce / se.conv_expand -> se.reduce / se.expand
    BatchNorm running stats land in the ``batch_stats`` collection.
    """
    import copy

    new_p = copy.deepcopy(params)
    new_bs = copy.deepcopy(batch_stats)
    n = 0

    def put(tree, path, val):
        nonlocal n
        node = tree
        for p in path[:-1]:
            if p not in node:
                return
            node = node[p]
        leaf = path[-1]
        if leaf not in node:
            return
        if tuple(node[leaf].shape) != tuple(val.shape):
            logger.warning("skip %s: shape %s vs %s", "/".join(path),
                           val.shape, node[leaf].shape)
            return
        node[leaf] = jnp.asarray(val, dtype=node[leaf].dtype)
        n += 1

    def put_bn(prefix_t: str, path: tuple[str, ...]):
        if f"{prefix_t}.weight" in sd:
            put(new_p, path + ("scale",), sd[f"{prefix_t}.weight"])
            put(new_p, path + ("bias",), sd[f"{prefix_t}.bias"])
        if f"{prefix_t}.running_mean" in sd:
            put(new_bs, path + ("mean",), sd[f"{prefix_t}.running_mean"])
            put(new_bs, path + ("var",), sd[f"{prefix_t}.running_var"])

    def put_conv(key_t: str, path: tuple[str, ...]):
        if key_t in sd:
            put(new_p, path + ("kernel",), _t_conv(sd[key_t]))
        bkey = key_t.replace(".weight", ".bias")
        if bkey in sd:
            put(new_p, path + ("bias",), sd[bkey])

    put_conv("conv_stem.weight", ("stem_conv",))
    put_bn("bn1", ("stem_bn",))
    put_conv("conv_head.weight", ("head_conv",))
    put_bn("bn2", ("head_bn",))
    if "classifier.weight" in sd:
        put(new_p, ("classifier", "kernel"), _t_linear(sd["classifier.weight"]))
        put(new_p, ("classifier", "bias"), sd["classifier.bias"])

    block_keys = sorted(
        {
            (int(m.group(1)), int(m.group(2)))
            for k in sd
            if (m := re.match(r"blocks\.(\d+)\.(\d+)\.", k))
        }
    )
    for s, b in block_keys:
        tp = f"blocks.{s}.{b}"
        ours = f"stage{s}_block{b}"
        has_exp_conv = f"{tp}.conv_exp.weight" in sd        # EdgeResidual
        has_pw = f"{tp}.conv_pw.weight" in sd
        has_pwl = f"{tp}.conv_pwl.weight" in sd
        if f"{tp}.conv.weight" in sd:                       # ConvBnAct (V2 fused, expand=1)
            put_conv(f"{tp}.conv.weight", (ours, "conv_proj"))
            put_bn(f"{tp}.bn1", (ours, "bn_proj"))
        elif has_exp_conv:
            put_conv(f"{tp}.conv_exp.weight", (ours, "conv_exp"))
            put_bn(f"{tp}.bn1", (ours, "bn_exp"))
            put_conv(f"{tp}.conv_pwl.weight", (ours, "conv_proj"))
            put_bn(f"{tp}.bn2", (ours, "bn_proj"))
        elif has_pw and has_pwl:                            # InvertedResidual
            put_conv(f"{tp}.conv_pw.weight", (ours, "conv_pw"))
            put_bn(f"{tp}.bn1", (ours, "bn_pw"))
            put_conv(f"{tp}.conv_dw.weight", (ours, "conv_dw"))
            put_bn(f"{tp}.bn2", (ours, "bn_dw"))
            put_conv(f"{tp}.conv_pwl.weight", (ours, "conv_proj"))
            put_bn(f"{tp}.bn3", (ours, "bn_proj"))
        else:                                               # DepthwiseSeparable
            put_conv(f"{tp}.conv_dw.weight", (ours, "conv_dw"))
            put_bn(f"{tp}.bn1", (ours, "bn_dw"))
            put_conv(f"{tp}.conv_pw.weight", (ours, "conv_proj"))
            put_bn(f"{tp}.bn2", (ours, "bn_proj"))
        put_conv(f"{tp}.se.conv_reduce.weight", (ours, "se", "reduce"))
        put_conv(f"{tp}.se.conv_expand.weight", (ours, "se", "expand"))
    return new_p, new_bs, n


# The final-classifier keys per architecture family (what timm strips when
# num_classes differs, and what `V3.2/train.py:100-106` strips always).
_HEAD_KEYS = (
    "head.fc.weight", "head.fc.bias",        # ConvNeXt
    "classifier.weight", "classifier.bias",  # EfficientNet
    "head.weight", "head.bias",              # ViT/DeiT
)


def load_checkpoint_into_variables(
    path: str, variables: dict, model_name: str, strip_head: bool = False
) -> dict:
    """Load a torch/safetensors checkpoint file into a flax variables dict.
    Backbone params may be nested under 'backbone' (deep supervision).
    ``strip_head`` drops the checkpoint's classifier keys so the target's
    (fresh) head survives."""
    sd = load_state_dict(path)
    if strip_head:
        sd = {k: v for k, v in sd.items() if k not in _HEAD_KEYS}
    params = variables["params"]
    nested = "backbone" in params
    target = params["backbone"] if nested else params
    out = dict(variables)
    if "convnext" in model_name:
        new_target, n = import_convnext(sd, target)
    elif model_name.startswith(("vit_", "deit_")):
        new_target, n = import_vit(sd, target)
    elif "efficientnet" in model_name:
        bs = variables.get("batch_stats", {})
        bs_target = bs.get("backbone", bs) if nested else bs
        new_target, new_bs, n = import_efficientnet(sd, target, bs_target)
        if nested and "backbone" in bs:
            out["batch_stats"] = {**bs, "backbone": new_bs}
        else:
            out["batch_stats"] = new_bs
    else:
        raise ValueError(
            f"No pretrained import mapping for {model_name!r} yet"
        )
    logger.info("loaded %d tensors from %s", n, path)
    if n == 0:
        logger.warning("no tensors matched; check checkpoint naming")
    new_params = dict(params)
    if nested:
        new_params["backbone"] = new_target
    else:
        new_params = new_target
    out["params"] = new_params
    return out


# --------------------------------------------------------------------------
# ConvNeXt: our flax tree -> timm keys (inverse of import_convnext)
# --------------------------------------------------------------------------

def export_convnext(
    params: dict, depths: tuple[int, ...], dims: tuple[int, ...]
) -> dict[str, np.ndarray]:
    """flax ConvNeXt params -> timm-keyed torch-layout state dict.

    Exact inverse of :func:`import_convnext` (round-trip tested,
    tests/test_pretrained.py). Lets checkpoints trained here be consumed by
    the reference's timm-based eval (`testdata.py:140-159` loads
    ``model_state_dict``-wrapped .pth files), and provides real checkpoint
    files to exercise the ``pretrained=true`` import path end-to-end when
    no downloaded weights exist (tools/export_timm_checkpoint.py)."""

    def inv_conv(w):  # flax HWIO -> torch OIHW
        return np.transpose(np.asarray(w, np.float32), (3, 2, 0, 1))

    def inv_lin(w):  # flax (in, out) -> torch (out, in)
        return np.transpose(np.asarray(w, np.float32), (1, 0))

    def g(*path):
        node = params
        for p in path:
            node = node[p]
        return np.asarray(node, np.float32)

    sd: dict[str, np.ndarray] = {}
    sd["stem.0.weight"] = inv_conv(g("stem_conv", "kernel"))
    sd["stem.0.bias"] = g("stem_conv", "bias")
    sd["stem.1.weight"] = g("stem_norm", "scale")
    sd["stem.1.bias"] = g("stem_norm", "bias")
    for i, depth in enumerate(depths):
        if i > 0:
            sd[f"stages.{i}.downsample.0.weight"] = g(f"downsample{i}_norm", "scale")
            sd[f"stages.{i}.downsample.0.bias"] = g(f"downsample{i}_norm", "bias")
            sd[f"stages.{i}.downsample.1.weight"] = inv_conv(
                g(f"downsample{i}_conv", "kernel")
            )
            sd[f"stages.{i}.downsample.1.bias"] = g(f"downsample{i}_conv", "bias")
        for j in range(depth):
            p = f"stage{i}_block{j}"
            tp = f"stages.{i}.blocks.{j}"
            sd[f"{tp}.conv_dw.weight"] = inv_conv(g(p, "conv_dw", "kernel"))
            sd[f"{tp}.conv_dw.bias"] = g(p, "conv_dw", "bias")
            sd[f"{tp}.norm.weight"] = g(p, "norm", "scale")
            sd[f"{tp}.norm.bias"] = g(p, "norm", "bias")
            sd[f"{tp}.mlp.fc1.weight"] = inv_lin(g(p, "mlp_fc1", "kernel"))
            sd[f"{tp}.mlp.fc1.bias"] = g(p, "mlp_fc1", "bias")
            sd[f"{tp}.mlp.fc2.weight"] = inv_lin(g(p, "mlp_fc2", "kernel"))
            sd[f"{tp}.mlp.fc2.bias"] = g(p, "mlp_fc2", "bias")
            sd[f"{tp}.gamma"] = g(p, "gamma")
    sd["head.norm.weight"] = g("head_norm", "scale")
    sd["head.norm.bias"] = g("head_norm", "bias")
    sd["head.fc.weight"] = inv_lin(g("head_fc", "kernel"))
    sd["head.fc.bias"] = g("head_fc", "bias")
    return sd


# --------------------------------------------------------------------------
# EfficientNet: our flax trees -> timm keys (inverse of import_efficientnet)
# --------------------------------------------------------------------------

def export_efficientnet(
    params: dict, batch_stats: dict
) -> dict[str, np.ndarray]:
    """flax EfficientNet params + batch_stats -> timm-keyed torch-layout
    state dict. Exact inverse of :func:`import_efficientnet` (round-trip
    tested, tests/test_pretrained.py): block forms are recovered from the
    parameter tree itself (conv_exp -> EdgeResidual, conv_pw+conv_dw ->
    InvertedResidual, conv_dw only -> DepthwiseSeparable, conv_proj only ->
    ConvBnAct), BatchNorm running stats come from ``batch_stats``."""

    def inv_conv(w):  # flax HWIO -> torch OIHW
        return np.transpose(np.asarray(w, np.float32), (3, 2, 0, 1))

    def inv_lin(w):  # flax (in, out) -> torch (out, in)
        return np.transpose(np.asarray(w, np.float32), (1, 0))

    sd: dict[str, np.ndarray] = {}

    def put_bn(prefix_t: str, node_p: dict, node_bs: dict) -> None:
        sd[f"{prefix_t}.weight"] = np.asarray(node_p["scale"], np.float32)
        sd[f"{prefix_t}.bias"] = np.asarray(node_p["bias"], np.float32)
        sd[f"{prefix_t}.running_mean"] = np.asarray(node_bs["mean"], np.float32)
        sd[f"{prefix_t}.running_var"] = np.asarray(node_bs["var"], np.float32)

    sd["conv_stem.weight"] = inv_conv(params["stem_conv"]["kernel"])
    put_bn("bn1", params["stem_bn"], batch_stats["stem_bn"])
    sd["conv_head.weight"] = inv_conv(params["head_conv"]["kernel"])
    put_bn("bn2", params["head_bn"], batch_stats["head_bn"])
    sd["classifier.weight"] = inv_lin(params["classifier"]["kernel"])
    sd["classifier.bias"] = np.asarray(params["classifier"]["bias"], np.float32)

    blocks = sorted(
        (int(m.group(1)), int(m.group(2)))
        for k in params
        if (m := re.match(r"stage(\d+)_block(\d+)$", k))
    )
    for s, b in blocks:
        ours = f"stage{s}_block{b}"
        p, bs = params[ours], batch_stats[ours]
        tp = f"blocks.{s}.{b}"
        if "conv_exp" in p:  # EdgeResidual (V2 fused, expand > 1)
            sd[f"{tp}.conv_exp.weight"] = inv_conv(p["conv_exp"]["kernel"])
            put_bn(f"{tp}.bn1", p["bn_exp"], bs["bn_exp"])
            sd[f"{tp}.conv_pwl.weight"] = inv_conv(p["conv_proj"]["kernel"])
            put_bn(f"{tp}.bn2", p["bn_proj"], bs["bn_proj"])
        elif "conv_pw" in p:  # InvertedResidual
            sd[f"{tp}.conv_pw.weight"] = inv_conv(p["conv_pw"]["kernel"])
            put_bn(f"{tp}.bn1", p["bn_pw"], bs["bn_pw"])
            sd[f"{tp}.conv_dw.weight"] = inv_conv(p["conv_dw"]["kernel"])
            put_bn(f"{tp}.bn2", p["bn_dw"], bs["bn_dw"])
            sd[f"{tp}.conv_pwl.weight"] = inv_conv(p["conv_proj"]["kernel"])
            put_bn(f"{tp}.bn3", p["bn_proj"], bs["bn_proj"])
        elif "conv_dw" in p:  # DepthwiseSeparableConv (expand == 1)
            sd[f"{tp}.conv_dw.weight"] = inv_conv(p["conv_dw"]["kernel"])
            put_bn(f"{tp}.bn1", p["bn_dw"], bs["bn_dw"])
            sd[f"{tp}.conv_pw.weight"] = inv_conv(p["conv_proj"]["kernel"])
            put_bn(f"{tp}.bn2", p["bn_proj"], bs["bn_proj"])
        else:  # ConvBnAct (V2 fused, expand == 1): conv_proj/bn_proj only
            sd[f"{tp}.conv.weight"] = inv_conv(p["conv_proj"]["kernel"])
            put_bn(f"{tp}.bn1", p["bn_proj"], bs["bn_proj"])
        if "se" in p:
            sd[f"{tp}.se.conv_reduce.weight"] = inv_conv(p["se"]["reduce"]["kernel"])
            sd[f"{tp}.se.conv_reduce.bias"] = np.asarray(
                p["se"]["reduce"]["bias"], np.float32
            )
            sd[f"{tp}.se.conv_expand.weight"] = inv_conv(p["se"]["expand"]["kernel"])
            sd[f"{tp}.se.conv_expand.bias"] = np.asarray(
                p["se"]["expand"]["bias"], np.float32
            )
    return sd
