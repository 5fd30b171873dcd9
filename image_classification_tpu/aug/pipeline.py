"""The fused augmentation pipelines.

``train_augment`` is the device-side replacement for the reference's entire
albumentations Compose (`dataset.py:192-240`): it takes a *batched uint8*
tensor straight from the loader and one PRNG key, and runs

    fused geometric warp (RRC+flips+SSR+distortion, one gather)
    -> OneOf{noise, gaussian blur, motion blur}
    -> ColorJitter
    -> OneOf{RGBShift, HSV, ToGray}
    -> CoarseDropout
    -> Normalize

entirely on device as one XLA program (it is always called inside the jitted
train step, so everything elementwise fuses). ``eval_preprocess`` is the
val/test path: Resize + Normalize (`dataset.py:242-256`).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from image_classification_tpu.aug import color as color_ops
from image_classification_tpu.aug import erase as erase_ops
from image_classification_tpu.aug import filters as filter_ops
from image_classification_tpu.aug import geometry as geom
from image_classification_tpu.aug import randaug as randaug_ops
from image_classification_tpu.core import prng


def _warp_impl(cfg, mesh=None) -> tuple[str, Any]:
    """(impl, shard_mesh) for the fused warp. Same mesh policy as block_mlp
    (models/factory.py): data-parallel-only meshes keep the Pallas kernel
    via jax.shard_map (per-shard rows, no collectives — the warp is
    per-image independent); tensor-parallel / fold meshes demote to the XLA
    form, which GSPMD shards cleanly (pallas_call itself has no SPMD
    partitioning rule)."""
    if getattr(cfg, "warp_impl", "xla") != "pallas":
        return "xla", None
    from image_classification_tpu.models.factory import _dp_only, _multi_device

    if mesh is not None:
        if mesh.devices.size == 1:
            return "pallas", None
        if _dp_only(mesh):
            return "pallas", mesh
        return "xla", None
    return ("xla" if _multi_device(cfg) else "pallas"), None


def aug_configs_from(cfg, mesh=None) -> dict:
    """Build the per-stage static configs from the framework Config.
    ``mesh``: the concrete training Mesh when known (see _warp_impl)."""
    warp_impl, warp_mesh = _warp_impl(cfg, mesh)
    return {
        "geometry": geom.GeometryCfg(
            warp_impl=warp_impl,
            shard_mesh=warp_mesh,
            rrc_scale=tuple(cfg.rrc_scale),
            rrc_ratio=tuple(cfg.rrc_ratio),
            hflip_prob=cfg.hflip_prob,
            vflip_prob=cfg.vflip_prob,
            ssr_prob=cfg.ssr_prob,
            shift_limit=cfg.shift_limit,
            scale_limit=cfg.scale_limit,
            rotate_limit=cfg.rotate_limit,
            distortion=geom.DistortionCfg(
                prob=cfg.distortion_prob,
                optical_distort_limit=cfg.optical_distort_limit,
                optical_shift_limit=cfg.optical_shift_limit,
                grid_distort_limit=cfg.grid_distort_limit,
                grid_num_steps=cfg.grid_num_steps,
                elastic_alpha=cfg.elastic_alpha,
                elastic_sigma=cfg.elastic_sigma,
            ),
        ),
        "noise_blur": filter_ops.NoiseBlurCfg(
            prob=cfg.noise_blur_prob,
            gauss_noise_var=tuple(cfg.gauss_noise_var),
            blur_limit=tuple(cfg.blur_limit),
        ),
        "jitter": color_ops.ColorJitterCfg(
            prob=cfg.color_jitter_prob,
            brightness=cfg.brightness,
            contrast=cfg.contrast,
            saturation=cfg.saturation,
            hue=cfg.hue,
        ),
        "color_shift": color_ops.ColorShiftCfg(
            prob=cfg.color_shift_prob,
            rgb_shift_limit=cfg.rgb_shift_limit,
            hsv_hue_limit=cfg.hsv_hue_limit,
            hsv_sat_limit=cfg.hsv_sat_limit,
            hsv_val_limit=cfg.hsv_val_limit,
        ),
        "erase": erase_ops.EraseCfg(
            prob=cfg.random_erasing_prob,
            max_holes=cfg.erase_max_holes,
            min_holes=cfg.erase_min_holes,
        ),
        "randaugment": (
            None
            if not cfg.use_randaugment
            else randaug_ops.RandAugmentCfg(
                prob=cfg.randaugment_prob,
                num_ops=cfg.randaugment_num_ops,
                magnitude=cfg.randaugment_magnitude,
                mag_std=cfg.randaugment_mag_std,
            )
        ),
        "image_size": tuple(cfg.image_size),
        "mean": tuple(cfg.mean),
        "std": tuple(cfg.std),
        # Pipeline compute dtype. bf16 halves HBM traffic through the whole
        # chain; its ~1-px quantization on the 0..255 scale is finer than the
        # uint8 pipeline the reference ran. Python-scalar constants keep
        # weak typing, so ops stay in this dtype end to end.
        "dtype": jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32,
    }


def normalize(
    images: jnp.ndarray,
    mean: tuple[float, float, float],
    std: tuple[float, float, float],
) -> jnp.ndarray:
    """(x/255 - mean) / std, matching A.Normalize (`dataset.py:233-236`).
    Keeps the input's float dtype (bf16 stays bf16)."""
    dtype = images.dtype if jnp.issubdtype(images.dtype, jnp.floating) else jnp.float32
    m = jnp.asarray(mean, dtype) * 255.0
    s = jnp.asarray(std, dtype) * 255.0
    return (images.astype(dtype) - m) * (1.0 / s)


def resize_bilinear(images: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Batched bilinear resize with half-pixel centers (cv2.resize
    INTER_LINEAR convention)."""
    B, _, _, C = images.shape
    return jax.image.resize(
        images, (B, out_hw[0], out_hw[1], C), method="linear"
    )


def train_augment(
    images_u8: jnp.ndarray, key: jax.Array, aug: dict
) -> jnp.ndarray:
    """uint8 (B, H, W, 3) -> augmented normalized float (B, Ho, Wo, 3)."""
    x = images_u8.astype(aug.get("dtype", jnp.float32))
    k_geo = prng.fold_name(key, "geometry")
    k_nb = prng.fold_name(key, "noise_blur")
    k_cj = prng.fold_name(key, "jitter")
    k_cs = prng.fold_name(key, "color_shift")
    k_er = prng.fold_name(key, "erase")
    x = geom.geometric_augment(x, k_geo, aug["image_size"], aug["geometry"])
    if aug.get("randaugment") is not None:
        x = randaug_ops.rand_augment(
            x, prng.fold_name(key, "randaug"), aug["randaugment"]
        )
    x = filter_ops.noise_blur_oneof(x, k_nb, aug["noise_blur"])
    x = color_ops.color_jitter(x, k_cj, aug["jitter"])
    x = color_ops.color_shift_oneof(x, k_cs, aug["color_shift"])
    x = erase_ops.coarse_dropout(x, k_er, aug["erase"])
    return normalize(x, aug["mean"], aug["std"])


def eval_preprocess(
    images_u8: jnp.ndarray,
    image_size: tuple[int, int],
    mean: tuple[float, float, float] = (0.485, 0.456, 0.406),
    std: tuple[float, float, float] = (0.229, 0.224, 0.225),
    dtype: Any = jnp.float32,
    round_uint8: bool = True,
) -> jnp.ndarray:
    """Resize + Normalize val/test path (`dataset.py:242-256`).

    ``round_uint8`` reproduces albumentations' A.Resize semantics: cv2
    resizes the *uint8* image (rounding each output pixel to uint8) before
    Normalize. Rounding the float resize output matches cv2's fixed-point
    uint8 path on ~94% of pixels exactly (the rest differ by 1 from cv2's
    11-bit coefficient quantization), which keeps submission argmax
    bit-stable against the reference on identical checkpoints
    (tests/test_infer_parity.py). Integers 0-255 are exact in bf16, so the
    rounding is dtype-safe. Set False for the pure-float convention.

    ``dtype`` is the pipeline compute dtype: pass bf16 to halve HBM traffic
    through the resize + normalize (and the TTA views downstream) — on the
    N-fold x 4-view ensemble this is the inference-throughput bottleneck."""
    x = images_u8.astype(dtype)
    if tuple(x.shape[1:3]) != tuple(image_size):
        x = resize_bilinear(x, image_size)
        if round_uint8:
            x = jnp.clip(jnp.round(x), 0.0, 255.0)
    return normalize(x, mean, std)
