"""Shared building blocks for all backbones.

All modules are NHWC (the TPU-native layout: channels on the 128-lane minor
dimension), take a ``dtype`` for bf16 compute with f32 parameters, and use
explicit PRNG collections for stochastic depth / dropout.
"""

from __future__ import annotations

from typing import Any, Callable

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
    """erf-based GELU, matching torch.nn.GELU's default."""
    return jax.nn.gelu(x, approximate=False)


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


def drop_path_rates(total: float, depths: tuple[int, ...]) -> list[list[float]]:
    """Linearly increasing stochastic-depth schedule across all blocks."""
    n = sum(depths)
    rates = [total * i / max(1, n - 1) for i in range(n)]
    out, i = [], 0
    for d in depths:
        out.append(rates[i : i + d])
        i += d
    return out
