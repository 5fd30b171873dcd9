"""EfficientNet (V1 B0-B4) and EfficientNetV2-S in flax.linen, NHWC.

The reference's earlier versions train timm ``efficientnet_b0`` (V1),
``efficientnet_b2``-class models (V3), and ``tf_efficientnetv2_s_in21ft1k``
(`V3.1/config.py` model name). V1 uses MBConv (expand 1x1 -> depthwise ->
SE -> project) with silu; V2-S replaces early stages with FusedMBConv.
Width/depth scaling follows the compound-scaling table.

BatchNorm running statistics live in the ``batch_stats`` collection; the
train step threads them through ``mutable=['batch_stats']``.
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from image_classification_tpu.models.layers import (
    DropPath,
    SqueezeExcite,
    global_avg_pool,
)

# (width_mult, depth_mult, default_res, dropout)
EFFNET_V1_SCALING = {
    "efficientnet_b0": (1.0, 1.0, 224, 0.2),
    "efficientnet_b1": (1.0, 1.1, 240, 0.2),
    "efficientnet_b2": (1.1, 1.2, 260, 0.3),
    "efficientnet_b3": (1.2, 1.4, 300, 0.3),
    "efficientnet_b4": (1.4, 1.8, 380, 0.4),
}

# base B0 stage spec: (expand, channels, blocks, stride, kernel)
_V1_STAGES = [
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
]

# EfficientNetV2-S: (expand, channels, blocks, stride, kernel, fused, se)
_V2_S_STAGES = [
    (1, 24, 2, 1, 3, True, False),
    (4, 48, 4, 2, 3, True, False),
    (4, 64, 4, 2, 3, True, False),
    (4, 128, 6, 2, 3, False, True),
    (6, 160, 9, 1, 3, False, True),
    (6, 256, 15, 2, 3, False, True),
]


def round_channels(c: float, mult: float, divisor: int = 8) -> int:
    c *= mult
    new_c = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new_c < 0.9 * c:
        new_c += divisor
    return new_c


def round_repeats(r: int, mult: float) -> int:
    return int(math.ceil(mult * r))


class StageSpec(NamedTuple):
    expand: int
    channels: int
    blocks: int
    stride: int
    kernel: int
    fused: bool
    se: bool


class MBConv(nn.Module):
    out_ch: int
    expand: int
    kernel: int
    stride: int
    fused: bool = False
    use_se: bool = True
    drop_path: float = 0.0
    dtype: Any = jnp.bfloat16
    bn_momentum: float = 0.9
    bn_eps: float = 1e-3

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_ch = x.shape[-1]
        mid = in_ch * self.expand
        shortcut = x

        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum, epsilon=self.bn_eps,
                dtype=self.dtype, name=name,
            )

        h = x
        if self.fused:
            if self.expand != 1:
                h = nn.Conv(mid, (self.kernel, self.kernel),
                            strides=(self.stride, self.stride), use_bias=False,
                            dtype=self.dtype, name="conv_exp")(h)
                h = bn("bn_exp")(h)
                h = jax.nn.silu(h)
        else:
            if self.expand != 1:
                h = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                            name="conv_pw")(h)
                h = bn("bn_pw")(h)
                h = jax.nn.silu(h)
            h = nn.Conv(mid, (self.kernel, self.kernel),
                        strides=(self.stride, self.stride),
                        feature_group_count=mid, use_bias=False,
                        dtype=self.dtype, name="conv_dw")(h)
            h = bn("bn_dw")(h)
            h = jax.nn.silu(h)
        if self.use_se:
            h = SqueezeExcite(max(1, in_ch // 4), dtype=self.dtype, name="se")(h)
        if self.fused and self.expand == 1:
            h = nn.Conv(self.out_ch, (self.kernel, self.kernel),
                        strides=(self.stride, self.stride), use_bias=False,
                        dtype=self.dtype, name="conv_proj")(h)
            h = bn("bn_proj")(h)
            h = jax.nn.silu(h)
        else:
            h = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                        name="conv_proj")(h)
            h = bn("bn_proj")(h)
        if self.stride == 1 and in_ch == self.out_ch:
            h = DropPath(self.drop_path)(h, deterministic=not train)
            h = h + shortcut
        return h


class EfficientNet(nn.Module):
    num_classes: int = 44
    stages: tuple[StageSpec, ...] = ()
    stem_ch: int = 32
    head_ch: int = 1280
    drop_rate: float = 0.2
    drop_path_rate: float = 0.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        deterministic: bool = True,
        return_features: bool = False,
    ):
        train = not deterministic
        x = x.astype(self.dtype)

        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-3,
                dtype=self.dtype, name=name,
            )

        x = nn.Conv(self.stem_ch, (3, 3), strides=(2, 2), use_bias=False,
                    dtype=self.dtype, name="stem_conv")(x)
        x = bn("stem_bn")(x)
        x = jax.nn.silu(x)
        total_blocks = sum(s.blocks for s in self.stages)
        block_idx = 0
        features = []
        for si, spec in enumerate(self.stages):
            for bi in range(spec.blocks):
                x = MBConv(
                    out_ch=spec.channels,
                    expand=spec.expand,
                    kernel=spec.kernel,
                    stride=spec.stride if bi == 0 else 1,
                    fused=spec.fused,
                    use_se=spec.se,
                    drop_path=self.drop_path_rate * block_idx / max(1, total_blocks - 1),
                    dtype=self.dtype,
                    name=f"stage{si}_block{bi}",
                )(x, train=train)
                block_idx += 1
            features.append(x)
        x = nn.Conv(self.head_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="head_conv")(x)
        x = bn("head_bn")(x)
        x = jax.nn.silu(x)
        x = global_avg_pool(x)
        if self.drop_rate > 0:
            x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)
        logits = nn.Dense(self.num_classes, dtype=jnp.float32, name="classifier")(x)
        if return_features:
            # last three stage outputs, mirroring deep-supervision taps
            return logits, features[-3:]
        return logits


def build_efficientnet(name: str, num_classes: int, **kwargs) -> EfficientNet:
    base = name.split(".")[0]
    for prefix in ("tf_",):
        base = base.removeprefix(prefix)
    for suffix in ("_ns", "_ap", "_in21ft1k", "_in21k", "_in1k"):
        base = base.replace(suffix, "")
    if base == "efficientnetv2_s":
        stages = tuple(StageSpec(*s) for s in _V2_S_STAGES)
        return EfficientNet(
            num_classes=num_classes, stages=stages, stem_ch=24, head_ch=1280,
            **kwargs,
        )
    if base in EFFNET_V1_SCALING:
        w, d, _res, drop = EFFNET_V1_SCALING[base]
        stages = tuple(
            StageSpec(e, round_channels(c, w), round_repeats(b, d), s, k,
                      fused=False, se=True)
            for (e, c, b, s, k) in _V1_STAGES
        )
        kwargs.setdefault("drop_rate", drop)
        return EfficientNet(
            num_classes=num_classes,
            stages=stages,
            stem_ch=round_channels(32, w),
            head_ch=round_channels(1280, w),
            **kwargs,
        )
    raise ValueError(f"Unknown EfficientNet variant: {name}")
