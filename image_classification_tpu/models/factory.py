"""Model factory: the framework's ``create_model``.

Replaces ``timm.create_model(name, pretrained, num_classes)`` +
DeepSupervisionModel wrapping (`train_advanced_v4.py:484-502`). Names match
timm's so reference configs port verbatim ('convnext_base',
'tf_efficientnetv2_s_in21ft1k', 'vit_base_patch16_224.augreg_in21k', ...).

Pretrained weights load from *local* torch/safetensors checkpoints via
``models.pretrained`` (there is no download path); missing files degrade to
random init with a warning, matching the reference's hub-download fallback
(`previous/V3-efb2/train_advanced_v3.0.py:337-348`).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from image_classification_tpu.models.convnext import CONVNEXT_CONFIGS, build_convnext
from image_classification_tpu.models.deep_supervision import DeepSupervisionModel
from image_classification_tpu.models.efficientnet import (
    EFFNET_V1_SCALING,
    build_efficientnet,
)
from image_classification_tpu.models.vit import VIT_CONFIGS, build_vit

logger = logging.getLogger("ic_tpu")


def _family(name: str) -> str:
    base = name.split(".")[0]
    if "convnext" in base:
        return "convnext"
    if "efficientnet" in base:
        return "efficientnet"
    if base.startswith(("vit_", "deit_")):
        return "vit"
    raise ValueError(f"Unknown model family for {name!r}")


def list_models() -> list[str]:
    return (
        sorted(CONVNEXT_CONFIGS)
        + sorted(EFFNET_V1_SCALING)
        + ["tf_efficientnetv2_s"]
        + sorted(VIT_CONFIGS)
    )


@dataclass
class ModelBundle:
    """A constructed model plus everything the trainer needs to drive it."""

    name: str
    module: nn.Module
    deep_supervised: bool
    has_batch_stats: bool
    input_size: tuple[int, int]
    # Identical-params twin WITHOUT shard_mesh, used for init: bundle.init
    # traces with batch 1 on the default device, which is incompatible with
    # a shard_map'd module (device-set mismatch + row counts not divisible
    # by the data axis). None = module is already mesh-free.
    init_module: nn.Module | None = None

    def init(self, rng: jax.Array, batch_size: int = 1) -> dict:
        x = jnp.zeros((batch_size, *self.input_size, 3), jnp.float32)
        module = self.init_module if self.init_module is not None else self.module
        return module.init({"params": rng, "dropout": rng}, x)

    def apply(
        self,
        variables: dict,
        x: jnp.ndarray,
        deterministic: bool = True,
        rngs: dict | None = None,
        mutable: Any = False,
    ):
        return self.module.apply(
            variables, x, deterministic=deterministic,
            rngs=rngs, mutable=mutable,
        )


def _multi_device(cfg) -> bool:
    """True when the run targets a non-trivial device mesh (cfg.mesh_data of
    -1 means "all devices" — resolve it against the live backend)."""
    data = cfg.mesh_data if cfg.mesh_data > 0 else jax.device_count()
    return data * cfg.mesh_model > 1


def _dp_only(mesh) -> bool:
    """True when ``mesh`` parallelizes over the "data" axis only (every
    other axis has size 1) — the regime where the Pallas block tail can run
    under shard_map with replicated weights."""
    return (
        mesh.shape.get("data", 1) > 1
        and all(n == 1 for ax, n in mesh.shape.items() if ax != "data")
    )


def create_model(cfg, model_name: str | None = None, mesh=None) -> ModelBundle:
    """Build a model from the framework Config (or an explicit name, for
    multi-architecture ensembles — `previous/V2-convbase/config.py:46-51`).

    ``mesh``: the concrete training Mesh, when known. On data-parallel-only
    meshes the fused Pallas block tail stays enabled via shard_map (rows
    sharded on "data", weights replicated — the weight-grad psum comes from
    shard_map's transpose rule); tensor-parallel or fold meshes demote to
    the XLA formulation, which GSPMD shards cleanly."""
    name = model_name or cfg.model_name
    family = _family(name)
    kwargs: dict[str, Any] = dict(
        drop_rate=cfg.drop_rate, drop_path_rate=cfg.drop_path_rate
    )
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    kwargs["dtype"] = dtype
    if family == "convnext":
        downsample_impl = cfg.downsample_impl
        if cfg.fold_parallel and downsample_impl == "conv":
            # Fold-parallel programs vmap the model over the fold axis, and
            # jax's batching rule for strided convs merges that axis into
            # the batch dim via reshape. On a (fold, data, model) mesh GSPMD
            # cannot re-shard across that merge and falls back to
            # "involuntary full rematerialization" (replicate-then-
            # repartition) in every downsample backward. The space-to-depth
            # matmul form (layers.patch_conv — identical params and math)
            # vmaps natively through dot_general's batch dims, so stacked
            # fold programs always lower downsamples as matmuls. Costs
            # ~1.7% on a single chip (docs/PERF_NOTES.md round-3 A/B); the
            # full-tensor copies it removes on real multi-chip dwarf that.
            downsample_impl = "matmul"
        block_mlp_impl = cfg.block_mlp_impl
        shard_mesh = None
        if block_mlp_impl == "pallas":
            if mesh is not None and _dp_only(mesh):
                shard_mesh = mesh
            elif (mesh is not None and mesh.size > 1) or (
                mesh is None and _multi_device(cfg)
            ):
                # pallas_call has no SPMD partitioning rule: under pjit over
                # a tp/fold mesh XLA would all-gather the (BHW, C)
                # activations to run the custom call replicated. The XLA
                # formulation shards cleanly, so those runs demote to it.
                block_mlp_impl = "xla"
        def _mk_convnext(mesh_):
            return build_convnext(
                name, cfg.num_classes, gelu_approximate=cfg.gelu_approximate,
                dwconv_impl=cfg.dwconv_impl, mlp_2d=cfg.mlp_2d,
                pin_layout=cfg.pin_layout, block_remat=cfg.block_remat,
                block_mlp_impl=block_mlp_impl,
                downsample_impl=downsample_impl,
                shard_mesh=mesh_,
                **kwargs,
            )

        backbone = _mk_convnext(shard_mesh)
        init_backbone = _mk_convnext(None) if shard_mesh is not None else None
    elif family == "efficientnet":
        backbone = build_efficientnet(name, cfg.num_classes, **kwargs)
        init_backbone = None
    else:
        backbone = build_vit(name, cfg.num_classes, **kwargs)
        init_backbone = None

    deep = bool(cfg.use_deep_supervision)

    def _wrap(bb):
        return (
            DeepSupervisionModel(backbone=bb, num_classes=cfg.num_classes)
            if deep
            else bb
        )

    return ModelBundle(
        name=name,
        module=_wrap(backbone),
        deep_supervised=deep,
        has_batch_stats=(family == "efficientnet"),
        input_size=tuple(cfg.image_size),
        init_module=None if init_backbone is None else _wrap(init_backbone),
    )


def load_pretrained_into(bundle: ModelBundle, variables: dict, cfg) -> dict:
    """Import a local torch checkpoint into freshly-initialized variables.
    Falls back to random init when no checkpoint is configured/found."""
    if not cfg.pretrained:
        return variables
    path = cfg.pretrained_path
    if not path:
        logger.warning(
            "pretrained=True but no pretrained_path set; using random init "
            "(no network download path exists)."
        )
        return variables
    from image_classification_tpu.models import pretrained as P

    try:
        return P.load_checkpoint_into_variables(
            path, variables, bundle.name,
            strip_head=getattr(cfg, "pretrained_strip_head", False),
        )
    except FileNotFoundError:
        logger.warning("pretrained checkpoint %s not found; random init", path)
        return variables
