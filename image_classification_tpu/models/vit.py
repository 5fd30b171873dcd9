"""Vision Transformer (ViT/DeiT) in flax.linen.

The reference lists ``vit_base_patch16_224.augreg_in21k`` and
``deit_base_patch16_224`` as ensemble members
(`previous/V2-convbase/config.py:46-51`); both are the standard ViT
architecture (DeiT differs only in training recipe / optional distillation
token, which the ensemble config does not use). Patch-embed conv, cls token,
learned position embeddings, pre-LN transformer blocks with exact GELU.

TPU notes: attention and MLP are pure MXU matmuls in bf16; sequence length
(197 at 224px) is padded by XLA as needed. The ``model`` mesh axis can shard
the MLP hidden dim for tensor parallelism (see parallel/shardings.py).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from image_classification_tpu.models.layers import DropPath, drop_path_rates, gelu_exact

VIT_CONFIGS: dict[str, dict] = {
    "vit_tiny_patch16_224": dict(patch=16, dim=192, depth=12, heads=3),
    "vit_small_patch16_224": dict(patch=16, dim=384, depth=12, heads=6),
    "vit_base_patch16_224": dict(patch=16, dim=768, depth=12, heads=12),
    "vit_large_patch16_224": dict(patch=16, dim=1024, depth=24, heads=16),
    "deit_tiny_patch16_224": dict(patch=16, dim=192, depth=12, heads=3),
    "deit_small_patch16_224": dict(patch=16, dim=384, depth=12, heads=6),
    "deit_base_patch16_224": dict(patch=16, dim=768, depth=12, heads=12),
}


class TransformerBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    drop_rate: float = 0.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads,
            dtype=self.dtype,
            dropout_rate=self.drop_rate,
            deterministic=deterministic,
            name="attn",
        )(h, h)
        x = x + DropPath(self.drop_path)(h, deterministic)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_fc1")(h)
        h = gelu_exact(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(h)
        return x + DropPath(self.drop_path)(h, deterministic)


class VisionTransformer(nn.Module):
    num_classes: int = 44
    patch: int = 16
    dim: int = 768
    depth: int = 12
    heads: int = 12
    mlp_ratio: float = 4.0
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        deterministic: bool = True,
        return_features: bool = False,
    ):
        B, H, W, _ = x.shape
        x = x.astype(self.dtype)
        from image_classification_tpu.models.layers import PatchConv

        x = PatchConv(
            self.dim, patch=self.patch, dtype=self.dtype, name="patch_embed"
        )(x)
        n_patches = (H // self.patch) * (W // self.patch)
        x = x.reshape(B, n_patches, self.dim)
        cls = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02), (1, 1, self.dim)
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (B, 1, self.dim)), x], axis=1
        )
        pos = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1, n_patches + 1, self.dim),
        )
        x = x + pos.astype(self.dtype)
        if self.drop_rate > 0:
            x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)
        dp = drop_path_rates(self.drop_path_rate, (self.depth,))[0]
        features = []
        for i in range(self.depth):
            x = TransformerBlock(
                self.dim, self.heads, self.mlp_ratio, drop_path=dp[i],
                drop_rate=self.drop_rate, dtype=self.dtype, name=f"block{i}",
            )(x, deterministic)
            if i in (self.depth // 2, 3 * self.depth // 4, self.depth - 1):
                features.append(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        cls_out = x[:, 0]
        logits = nn.Dense(self.num_classes, dtype=jnp.float32, name="head")(cls_out)
        if return_features:
            return logits, features
        return logits


def build_vit(name: str, num_classes: int, **kwargs) -> VisionTransformer:
    base = name.split(".")[0]
    if base not in VIT_CONFIGS:
        raise ValueError(f"Unknown ViT variant: {name}")
    c = VIT_CONFIGS[base]
    return VisionTransformer(
        num_classes=num_classes, patch=c["patch"], dim=c["dim"],
        depth=c["depth"], heads=c["heads"], **kwargs,
    )
