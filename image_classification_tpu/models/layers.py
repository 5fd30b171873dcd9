"""Shared building blocks for all backbones.

All modules are NHWC (the TPU-native layout: channels on the 128-lane minor
dimension), take a ``dtype`` for bf16 compute with f32 parameters, and use
explicit PRNG collections for stochastic depth / dropout.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class DropPath(nn.Module):
    """Stochastic depth: drop the whole residual branch per sample."""

    rate: float = 0.0
    deterministic: bool | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool | None = None) -> jnp.ndarray:
        det = nn.merge_param("deterministic", self.deterministic, deterministic)
        if self.rate == 0.0 or det:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


def gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    """erf-based GELU, matching torch.nn.GELU's default — computed via the
    A&S erf (ops/gelu.py) instead of XLA's erf expansion (measured VPU win,
    identical to ~1.5e-7)."""
    from image_classification_tpu.ops.gelu import gelu_erf_free

    return gelu_erf_free(x)


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, C)."""
    return jnp.mean(x, axis=(1, 2))


class SqueezeExcite(nn.Module):
    """SE block with reduced hidden width, silu gate (EfficientNet-style)."""

    hidden: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = global_avg_pool(x)[:, None, None, :]
        s = nn.Conv(self.hidden, (1, 1), dtype=self.dtype, name="reduce")(s)
        s = jax.nn.silu(s)
        s = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, name="expand")(s)
        return x * jax.nn.sigmoid(s)


class ShiftDWConv(nn.Module):
    """KxK depthwise conv as K^2 statically-shifted FMAs (no lax.conv).

    XLA lowers depthwise convs on TPU with channel-major activation layouts
    (`{3,0,2,1}`), forcing relayout copies around every block that depress
    the neighboring MLP matmuls' MFU (profiled in docs/PERF_NOTES.md). This
    form is pure elementwise VPU work on whatever layout the matmuls prefer:
    ``out = bias + sum_{dy,dx} w[dy,dx] * x_pad[:, dy:dy+H, dx:dx+W, :]``.
    Same math, same parameter shapes/names as ``nn.Conv(features, (K,K),
    feature_group_count=features)`` so checkpoints are unaffected.
    """

    features: int
    kernel_size: int = 7
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        K = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (K, K, 1, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        H, W = x.shape[1], x.shape[2]
        pad = K // 2
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        w = kernel.astype(self.dtype).reshape(K, K, self.features)
        out = bias.astype(self.dtype) * jnp.ones((), self.dtype)
        for dy in range(K):
            for dx in range(K):
                out = out + xp[:, dy : dy + H, dx : dx + W, :] * w[dy, dx]
        return out


class PallasDWConv(nn.Module):
    """7x7 depthwise conv via the Pallas stencil kernel (ops/dwconv.py).

    Unlike lax.conv, the kernel consumes/produces standard row-major tiles,
    so XLA never propagates channel-major ``{3,0,2,1}`` layouts (and their
    relayout copies) across the block, and the wgrad avoids the pathological
    ``f32[7,7,1,C]`` accumulator fusions (docs/PERF_NOTES.md). Same math and
    parameter shapes/names as ``nn.Conv(features, (7,7),
    feature_group_count=features)`` so checkpoints are unaffected. Falls
    back to lax.conv off-TPU.
    """

    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from image_classification_tpu.ops.dwconv import depthwise_conv7x7

        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (7, 7, 1, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        out = depthwise_conv7x7(
            x.astype(self.dtype), kernel.astype(self.dtype)[:, :, 0, :]
        )
        return out + bias.astype(out.dtype)


def patch_conv(
    x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray | None, patch: int
) -> jnp.ndarray:
    """Non-overlapping PxP/stride-P conv as space-to-depth + matmul.

    Stride-P kernel-P convs (ConvNeXt stem 4x4/4, downsamples 2x2/2, ViT
    patch embed) are exactly a reshape of PxP patches into channels followed
    by a 1x1 matmul. XLA's conv path tiles C_in on the 128-lane axis — for
    the 3-channel stem that is 2% lane utilization; the matmul form uses the
    MXU cleanly. Bit-identical math; kernel keeps its conv shape
    (P, P, Cin, Cout) so checkpoints are unaffected.
    """
    B, H, W, Cin = x.shape
    P = patch
    if P == 2:
        # 2x2/2 lowering without the 6D space-to-depth transpose (which XLA
        # lowers badly — docs/PERF_NOTES.md round-1): fold the W pixel pairs
        # into channels with a FREE reshape (W and C are memory-adjacent in
        # row-major NHWC), interleave the two H phases with strided slices +
        # concat, and run ONE (B*Ho*Wo, 4Cin) matmul on the MXU. Channel
        # order after the fold is (i, j, c) == kernel.reshape(4Cin, -1), so
        # the math is bit-identical to the conv. Odd H/W take the same
        # right/bottom zero pad nn.Conv's SAME padding would apply
        # (k=2, s=2 -> pad_total=1, all of it on the high side).
        Hp, Wp = H + (H % 2), W + (W % 2)
        if (Hp, Wp) != (H, W):
            x = jnp.pad(x, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
        xr = x.reshape(B, Hp, Wp // 2, 2 * Cin)
        xcat = jnp.concatenate([xr[:, 0::2], xr[:, 1::2]], axis=-1)
        w = kernel.reshape(4 * Cin, -1)
        out = jax.lax.dot_general(
            xcat.reshape(-1, 4 * Cin), w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        out = out.reshape(B, Hp // 2, Wp // 2, -1)
        return out if bias is None else out + bias.astype(out.dtype)
    if H % P or W % P:  # fall back for odd sizes
        out = jax.lax.conv_general_dilated(
            x, kernel, (P, P), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out if bias is None else out + bias
    x = x.reshape(B, H // P, P, W // P, P, Cin)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // P, W // P, P * P * Cin)
    w = kernel.reshape(P * P * Cin, -1)
    out = jax.lax.dot_general(
        x, w,
        dimension_numbers=(((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return out if bias is None else out + bias.astype(out.dtype)


class PatchConv(nn.Module):
    """Drop-in for nn.Conv with kernel_size == stride (params identical)."""

    features: int
    patch: int
    dtype: Any = jnp.bfloat16
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.patch, self.patch, cin, self.features),
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        return patch_conv(
            x.astype(self.dtype), kernel.astype(self.dtype),
            None if bias is None else bias, self.patch,
        )


def drop_path_rates(total: float, depths: tuple[int, ...]) -> list[list[float]]:
    """Linearly increasing stochastic-depth schedule across all blocks."""
    n = sum(depths)
    rates = [total * i / max(1, n - 1) for i in range(n)]
    out, i = [], 0
    for d in depths:
        out.append(rates[i : i + d])
        i += d
    return out
