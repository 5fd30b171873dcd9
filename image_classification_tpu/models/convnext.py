"""ConvNeXt family in flax.linen, NHWC, bf16-compute/f32-params.

The flagship backbone: the reference trains timm's ``convnext_base``
(`config.py:20`, created at `train_advanced_v4.py:484-502`). Architecture per
the ConvNeXt paper: patchify stem (4x4/4 conv + LN), four stages of blocks
(7x7 depthwise conv -> LN -> 4x MLP with exact GELU -> layer scale ->
stochastic depth + residual), LN+2x2/2 downsample between stages, and a
GAP -> LN -> Linear head.

TPU notes: NHWC keeps C on the lane dimension so the 1x1 MLP matmuls hit the
MXU directly; the depthwise 7x7 runs on the VPU. Depths/dims tables match
timm so pretrained checkpoints import 1:1 (see ``pretrained.py``).

``__call__(..., return_features=True)`` additionally returns the outputs of
stages 2..4 for the deep-supervision wrapper (`train_advanced_v4.py:126-151`
captures exactly those).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from image_classification_tpu.ops.gelu import gelu_dispatch, gelu_erf_free

from image_classification_tpu.models.layers import (
    DropPath,
    PallasDWConv,
    PatchConv,
    ShiftDWConv,
    drop_path_rates,
    global_avg_pool,
)

# name -> (depths, dims); aligned with timm model names
CONVNEXT_CONFIGS: dict[str, tuple[tuple[int, ...], tuple[int, ...]]] = {
    "convnext_atto": ((2, 2, 6, 2), (40, 80, 160, 320)),
    "convnext_femto": ((2, 2, 6, 2), (48, 96, 192, 384)),
    "convnext_pico": ((2, 2, 6, 2), (64, 128, 256, 512)),
    "convnext_nano": ((2, 2, 8, 2), (80, 160, 320, 640)),
    "convnext_tiny": ((3, 3, 9, 3), (96, 192, 384, 768)),
    "convnext_small": ((3, 3, 27, 3), (96, 192, 384, 768)),
    "convnext_base": ((3, 3, 27, 3), (128, 256, 512, 1024)),
    "convnext_large": ((3, 3, 27, 3), (192, 384, 768, 1536)),
    "convnext_xlarge": ((3, 3, 27, 3), (256, 512, 1024, 2048)),
}


def _pin_row_major(x: jnp.ndarray) -> jnp.ndarray:
    """Constrain an intermediate to the row-major layout (experimental
    single-chip perf switch behind ``cfg.pin_layout``)."""
    from jax.experimental.layout import Layout, with_layout_constraint

    return with_layout_constraint(x, Layout(tuple(range(x.ndim))))


class _AffineParams(nn.Module):
    """Parameter holder with nn.LayerNorm's exact param tree (scale, bias) —
    lets the fused Pallas block consume LN params while staying checkpoint-
    compatible with the flax path."""
    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return scale, bias


class _DenseParams(nn.Module):
    """Parameter holder with nn.Dense's exact param tree (kernel, bias)."""
    features_in: int
    features_out: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.features_in, self.features_out),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features_out,))
        return kernel, bias


class ConvNeXtBlock(nn.Module):
    dim: int
    drop_path: float = 0.0
    layer_scale_init: float = 1e-6
    dtype: Any = jnp.bfloat16
    gelu_approximate: bool = False
    gelu_impl: str = "xla"      # "xla" | "pallas" (ops/gelu.py)
    dwconv_impl: str = "conv"   # "conv" (lax.conv) | "shift" (see ShiftDWConv)
    mlp_2d: bool = False        # flatten (B,H,W,C)->(BHW,C) around LN+MLP
    pin_layout: bool = False    # force row-major around the dwconv
    block_mlp_impl: str = "xla"  # "xla" | "pallas" (ops/block_mlp.py)
    # Concrete jax.sharding.Mesh for data-parallel-only runs: the fused
    # Pallas tail is wrapped in jax.shard_map (rows sharded on "data",
    # params replicated), so each shard runs the kernel on its local rows
    # and shard_map's transpose rule inserts the weight-grad psum. None =
    # single-device direct call. tp>1 meshes demote to XLA instead
    # (models/factory.py) — the Megatron-sharded MLP weights would need
    # an in-kernel collective.
    shard_mesh: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        pin = self.pin_layout and self.dwconv_impl == "conv"
        if pin:
            x = _pin_row_major(x)
        shortcut = x
        if self.dwconv_impl == "shift":
            x = ShiftDWConv(self.dim, 7, dtype=self.dtype, name="conv_dw")(x)
        elif self.dwconv_impl == "pallas":
            # layout-neutral Pallas stencil; pin_layout is moot here (the
            # kernel already forces standard row-major tiles)
            x = PallasDWConv(self.dim, dtype=self.dtype, name="conv_dw")(x)
        else:
            x = nn.Conv(
                self.dim, (7, 7), feature_group_count=self.dim,
                dtype=self.dtype, name="conv_dw",
            )(x)
        if pin:
            x = _pin_row_major(x)
        x = checkpoint_name(x, "dwconv_out")
        shape4 = x.shape

        # Fused Pallas block tail: LN->fc1->GELU(erf)->fc2->gamma->residual
        # in one kernel, VMEM-resident intermediates, dots-remat backward
        # (ops/block_mlp.py). Falls back to the flax path for drop_path>0,
        # tanh GELU, or channel widths whose weights don't fit VMEM.
        from image_classification_tpu.ops.block_mlp import block_mlp_available

        if (
            self.block_mlp_impl == "pallas"
            and self.drop_path == 0.0
            and not self.gelu_approximate
            and block_mlp_available(self.dim)
        ):
            from image_classification_tpu.ops.block_mlp import (
                block_mlp,
                interpret_forced,
                pick_tm,
            )

            s, t = _AffineParams(self.dim, name="norm")()
            w1, b1 = _DenseParams(self.dim, 4 * self.dim, name="mlp_fc1")()
            w2, b2 = _DenseParams(4 * self.dim, self.dim, name="mlp_fc2")()
            gamma = self.param(
                "gamma", nn.initializers.constant(self.layer_scale_init),
                (self.dim,),
            )
            x2 = x.reshape(-1, shape4[-1])
            res2 = shortcut.reshape(-1, shape4[-1])
            # shard_map requires the row dim divisible by the data axis.
            # Training/eval batches always are (batch_size % dp == 0,
            # enforced upstream) but bundle.init traces with batch 1 —
            # odd row counts there take the direct single-device call.
            rows_shardable = (
                self.shard_mesh is not None
                and x2.shape[0] % self.shard_mesh.shape["data"] == 0
            )
            if rows_shardable:
                from jax.sharding import PartitionSpec as P_

                def _local(x2l, res2l, sl, tl, w1l, b1l, w2l, b2l, gl):
                    # local row count (BHW/dp) at trace time -> local tile
                    return block_mlp(
                        x2l, res2l, sl, tl, w1l, b1l, w2l, b2l, gl, 1e-6,
                        pick_tm(x2l.shape[0], c=self.dim),
                        interpret_forced(),
                    )

                out = jax.shard_map(
                    _local, mesh=self.shard_mesh,
                    in_specs=(P_("data"), P_("data")) + (P_(),) * 7,
                    out_specs=P_("data"),
                    # pallas_call's ShapeDtypeStruct outputs carry no vma
                    # annotation; the varying/replicated analysis cannot see
                    # through the custom call, so it is disabled here (the
                    # sharded==single-device equivalence is covered by
                    # tests/test_multichip.py).
                    check_vma=False,
                )(x2, res2, s, t, w1, b1, w2, b2, gamma)
            else:
                out = block_mlp(x2, res2, s, t, w1, b1, w2, b2, gamma,
                                1e-6, pick_tm(x2.shape[0], c=self.dim),
                                interpret_forced())
            return out.reshape(shape4)

        if self.mlp_2d:
            # XLA assigns channel-major layouts ({3,0,2,1}) to small-H/W
            # stage activations around the depthwise conv, which decomposes
            # the MLP matmuls into per-sample M=H*W matmuls (~60 TFLOP/s
            # observed). A rank-2 view forces one row-major relayout copy
            # (cheap) and lets the matmul see M=B*H*W.
            x = x.reshape(-1, shape4[-1])
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(4 * self.dim, dtype=self.dtype, name="mlp_fc1")(x)
        if self.gelu_approximate:
            x = jax.nn.gelu(x, approximate=True)
        else:
            # exact GELU without XLA's erf expansion (ops/gelu.py — the
            # same A&S math the fused kernel uses; measured +win on the
            # stage-3 tail, docs/PERF_NOTES.md round 4). gelu_impl=pallas
            # emits it as a single custom call instead (round-5 A/B).
            x = gelu_dispatch(x, self.gelu_impl)
        x = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(x)
        gamma = self.param(
            "gamma", nn.initializers.constant(self.layer_scale_init), (self.dim,)
        )
        x = x * gamma.astype(self.dtype)
        if self.mlp_2d:
            x = x.reshape(shape4)
        x = DropPath(self.drop_path)(x, deterministic)
        return shortcut + x


class ConvNeXt(nn.Module):
    num_classes: int = 44
    depths: tuple[int, ...] = (3, 3, 27, 3)
    dims: tuple[int, ...] = (128, 256, 512, 1024)
    drop_path_rate: float = 0.0
    drop_rate: float = 0.0
    dtype: Any = jnp.bfloat16
    gelu_approximate: bool = False
    gelu_impl: str = "xla"  # "xla" | "pallas" (ops/gelu.py)
    dwconv_impl: str = "conv"
    mlp_2d: bool = False
    pin_layout: bool = False
    block_remat: str = "none"  # "none" | "dots" | "full"
    block_mlp_impl: str = "xla"  # "xla" | "pallas" (ops/block_mlp.py)
    downsample_impl: str = "conv"  # "conv" | "matmul" (layers.patch_conv P=2)
    shard_mesh: Any = None  # dp-only mesh for shard_map'd Pallas tails

    def _block_cls(self):
        """ConvNeXtBlock, optionally remat-wrapped.

        "dots": save only matmul outputs + the dwconv output
        (checkpoint_name'd in the block); LayerNorm/GELU recompute in the
        backward pass, removing their (tokens, 4C) fwd residual stores.
        "full": recompute the whole block from its input (max memory
        savings, e.g. for large-image fine-tuning).
        """
        if self.block_remat == "none":
            return ConvNeXtBlock
        policy = None
        if self.block_remat == "dots":
            cps = jax.checkpoint_policies
            policy = cps.save_from_both_policies(
                cps.checkpoint_dots,
                cps.save_only_these_names("dwconv_out"),
            )
        return nn.remat(ConvNeXtBlock, policy=policy, static_argnums=(2,))

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        deterministic: bool = True,
        return_features: bool = False,
    ):
        block_cls = self._block_cls()
        x = x.astype(self.dtype)
        # stem & downsamples are stride==kernel convs -> space-to-depth
        # matmuls (see layers.PatchConv; params identical to nn.Conv)
        x = PatchConv(self.dims[0], patch=4, dtype=self.dtype,
                      name="stem_conv")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="stem_norm")(x)
        dp = drop_path_rates(self.drop_path_rate, self.depths)
        features = []
        for i, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if i > 0:
                x = nn.LayerNorm(
                    epsilon=1e-6, dtype=self.dtype, name=f"downsample{i}_norm"
                )(x)
                if (
                    self.downsample_impl == "matmul"
                    or (x.shape[1] == 2 and x.shape[2] == 2)
                ):
                    # W-fold + H-interleave + one MXU matmul (identical math
                    # and params — layers.patch_conv P=2 path). Always used
                    # for the degenerate 2x2 -> 1x1 downsample, which also
                    # works around an XLA SPMD miscompile: vmapped strided
                    # convs with size-1 spatial output return wrong values
                    # when the mapped dim is sharded (hits fold-parallel CPU
                    # tests at 32px inputs; GSPMD and Shardy both affected,
                    # verified jax 0.9.0).
                    x = PatchConv(
                        dim, patch=2, dtype=self.dtype,
                        name=f"downsample{i}_conv",
                    )(x)
                else:
                    x = nn.Conv(
                        dim, (2, 2), strides=(2, 2), dtype=self.dtype,
                        name=f"downsample{i}_conv",
                    )(x)
            for j in range(depth):
                x = block_cls(
                    dim, drop_path=dp[i][j], dtype=self.dtype,
                    gelu_approximate=self.gelu_approximate,
                    dwconv_impl=self.dwconv_impl, mlp_2d=self.mlp_2d,
                    pin_layout=self.pin_layout,
                    block_mlp_impl=self.block_mlp_impl,
                    shard_mesh=self.shard_mesh,
                    name=f"stage{i}_block{j}",
                )(x, deterministic)
            if i > 0:
                features.append(x)  # stages 2..4, as the reference captures
        x = global_avg_pool(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="head_norm")(x)
        if self.drop_rate > 0:
            x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)
        logits = nn.Dense(self.num_classes, dtype=jnp.float32, name="head_fc")(x)
        if return_features:
            return logits, features
        return logits

    @property
    def feature_dims(self) -> tuple[int, ...]:
        return tuple(self.dims[1:])


def build_convnext(name: str, num_classes: int, **kwargs) -> ConvNeXt:
    base = name.split(".")[0]
    for suffix in ("_in22k", "_in1k", "_384"):
        base = base.replace(suffix, "")
    if base not in CONVNEXT_CONFIGS:
        raise ValueError(f"Unknown ConvNeXt variant: {name}")
    depths, dims = CONVNEXT_CONFIGS[base]
    return ConvNeXt(num_classes=num_classes, depths=depths, dims=dims, **kwargs)
