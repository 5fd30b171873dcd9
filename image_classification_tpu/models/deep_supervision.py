"""Deep supervision wrapper.

Mirrors the reference's ``DeepSupervisionModel``
(`train_advanced_v4.py:96-151`): the backbone exposes its late-stage feature
maps (stages 2..4 for ConvNeXt); each gets an auxiliary classifier of
global-average-pool -> Linear; forward returns (main_logits, aux1, aux2, ...)
— a tuple rather than a list, so it is a static pytree under jit.
"""

from __future__ import annotations


import flax.linen as nn
import jax.numpy as jnp

from image_classification_tpu.models.layers import global_avg_pool


class DeepSupervisionModel(nn.Module):
    backbone: nn.Module
    num_classes: int = 44

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, deterministic: bool = True
    ) -> tuple[jnp.ndarray, ...]:
        logits, feats = self.backbone(x, deterministic, return_features=True)
        outs = [logits]
        for i, f in enumerate(feats):
            if f.ndim == 4:
                pooled = global_avg_pool(f)
            else:  # token sequence (ViT): mean over tokens
                pooled = jnp.mean(f, axis=1)
            aux = nn.Dense(
                self.num_classes, dtype=jnp.float32, name=f"aux_head{i}"
            )(pooled.astype(jnp.float32))
            outs.append(aux)
        return tuple(outs)
