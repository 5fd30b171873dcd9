"""In-batch MixUp / CutMix with soft labels.

The reference wraps the dataset so each sample, with p=0.5, is mixed with a
*uniformly random second sample* — decoding and augmenting it a second time
on the CPU (`dataset.py:70-190`, dispatch at `:157-190`). The TPU-native
equivalent mixes *inside the jitted train step* against a random permutation
of the already-augmented batch — zero extra IO. (Partner choice is uniform
within the shuffled batch rather than uniform over the whole dataset; with a
shuffled loader the marginal partner distribution is the same, the only
difference being without- vs with-replacement within a batch.)

Semantics preserved exactly (per sample, not per batch):
- Bernoulli(mix_prob) gate; unmixed samples still get one-hot labels
  (`dataset.py:167-172`);
- 50/50 mixup-vs-cutmix choice (`dataset.py:185-188`);
- mixup: lambda ~ Beta(a, a), pixel lerp, label lerp (`dataset.py:81-108`);
- cutmix: lambda ~ Beta(a, a), centered box of relative size sqrt(1-lambda)
  clipped to the image, lambda re-derived from the exact pasted pixel count
  (`dataset.py:110-155`, correction at `:152`).

Mixing happens after normalization; both mixup (affine) and cutmix
(selection) commute with the affine Normalize, so this is mathematically
identical to the reference's mix-after-transform ordering.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class MixCfg(NamedTuple):
    mixup_alpha: float = 0.2
    cutmix_alpha: float = 1.0
    prob: float = 0.5
    num_classes: int = 44


def one_hot_labels(labels: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    return jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)


def _beta(key: jax.Array, alpha: float, shape) -> jnp.ndarray:
    if alpha <= 0:
        return jnp.ones(shape)
    return jax.random.beta(key, alpha, alpha, shape)


def mixup_cutmix_batch(
    images: jnp.ndarray,
    labels: jnp.ndarray,
    key: jax.Array,
    cfg: MixCfg,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """images (B,H,W,C) float; labels (B,) int -> (mixed images, soft labels)."""
    B, H, W, _ = images.shape
    k_perm, k_gate, k_choice, k_lam_m, k_lam_c, k_cx, k_cy = jax.random.split(key, 7)
    onehot = one_hot_labels(labels, cfg.num_classes)
    partner = jax.random.permutation(k_perm, B)
    images2 = images[partner]
    onehot2 = onehot[partner]

    do_mix = jax.random.bernoulli(k_gate, cfg.prob, (B,))
    use_mixup = jax.random.bernoulli(k_choice, 0.5, (B,)) & (cfg.mixup_alpha > 0)

    # ---- mixup branch
    lam_m = _beta(k_lam_m, cfg.mixup_alpha, (B,))
    lam_img = lam_m.astype(images.dtype)[:, None, None, None]
    mixed_img = images * lam_img + images2 * (1.0 - lam_img)
    mixed_lab = onehot * lam_m[:, None] + onehot2 * (1.0 - lam_m[:, None])

    # ---- cutmix branch
    lam_c = _beta(k_lam_c, cfg.cutmix_alpha, (B,))
    cut_rat = jnp.sqrt(1.0 - lam_c)
    cut_w = (W * cut_rat).astype(jnp.int32)
    cut_h = (H * cut_rat).astype(jnp.int32)
    cx = jax.random.randint(k_cx, (B,), 0, W)
    cy = jax.random.randint(k_cy, (B,), 0, H)
    x1 = jnp.clip(cx - cut_w // 2, 0, W)
    y1 = jnp.clip(cy - cut_h // 2, 0, H)
    x2 = jnp.clip(cx + cut_w // 2, 0, W)
    y2 = jnp.clip(cy + cut_h // 2, 0, H)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)[None]
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)[None]
    in_box = (
        (xs >= x1[:, None, None])
        & (xs < x2[:, None, None])
        & (ys >= y1[:, None, None])
        & (ys < y2[:, None, None])
    )
    cut_img = jnp.where(in_box[..., None], images2, images)
    # exact-area lambda correction (`dataset.py:152`)
    lam_exact = 1.0 - ((x2 - x1) * (y2 - y1)).astype(jnp.float32) / float(W * H)
    cut_lab = onehot * lam_exact[:, None] + onehot2 * (1.0 - lam_exact[:, None])

    sel_img = jnp.where(use_mixup[:, None, None, None], mixed_img, cut_img)
    sel_lab = jnp.where(use_mixup[:, None], mixed_lab, cut_lab)
    out_img = jnp.where(do_mix[:, None, None, None], sel_img, images)
    out_lab = jnp.where(do_mix[:, None], sel_lab, onehot)
    return out_img, out_lab
