import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_classification_tpu.aug import geometry as G


def test_reflect101_index():
    idx = jnp.arange(-4, 10)
    out = np.asarray(G.reflect101_index(idx, 6))
    # OpenCV BORDER_REFLECT_101 for n=6: ... 4 3 2 1 | 0..5 | 4 3 2 1
    expected = [4, 3, 2, 1, 0, 1, 2, 3, 4, 5, 4, 3, 2, 1]
    np.testing.assert_array_equal(out, expected)


def test_bilinear_gather_matches_cv2_remap(rng):
    img = rng.integers(0, 256, size=(1, 40, 50, 3)).astype(np.float32)
    # random float coords, including out-of-range ones
    ys = rng.uniform(-5, 44, size=(30, 35)).astype(np.float32)
    xs = rng.uniform(-5, 54, size=(30, 35)).astype(np.float32)
    coords = np.stack([ys, xs], axis=-1)[None]
    ours = np.asarray(G.bilinear_gather(jnp.asarray(img), jnp.asarray(coords)))
    ref = cv2.remap(
        img[0], xs, ys, interpolation=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_REFLECT_101,
    )
    # cv2.remap uses 5-bit fixed-point interpolation weights; tolerance covers it
    np.testing.assert_allclose(ours[0], ref, atol=16.0)
    # interior points should be much tighter
    inner = (ys > 1) & (ys < 38) & (xs > 1) & (xs < 48)
    np.testing.assert_allclose(ours[0][inner], ref[inner], atol=16.0)


def test_ssr_matrix_matches_cv2():
    H, W = 260, 260
    angle, scale, dx, dy = 17.0, 1.13, 0.07, -0.05
    ours = np.asarray(
        G.ssr_forward_matrix(
            jnp.array([angle]), jnp.array([scale]), jnp.array([dx]),
            jnp.array([dy]), (H, W),
        )
    )[0]
    M = cv2.getRotationMatrix2D(((W - 1) / 2, (H - 1) / 2), angle, scale)
    M[0, 2] += dx * W
    M[1, 2] += dy * H
    np.testing.assert_allclose(ours[:2], M, atol=1e-5)


def test_identity_geometry_roundtrip(rng):
    """scale=(1,1), ratio fixed to the native aspect, no flips/SSR/distortion
    -> the warp must reproduce the input exactly."""
    img = rng.integers(0, 256, size=(2, 60, 80, 3)).astype(np.float32)
    cfg = G.GeometryCfg(
        rrc_scale=(1.0, 1.0),
        rrc_ratio=(80 / 60, 80 / 60),
        hflip_prob=0.0,
        vflip_prob=0.0,
        ssr_prob=0.0,
        distortion=G.DistortionCfg(prob=0.0),
    )
    out = np.asarray(
        G.geometric_augment(jnp.asarray(img), jax.random.key(0), (60, 80), cfg)
    )
    np.testing.assert_allclose(out, img, atol=1e-3)


def test_full_image_resize_matches_cv2(rng):
    img = rng.integers(0, 256, size=(1, 60, 80, 3)).astype(np.float32)
    cfg = G.GeometryCfg(
        rrc_scale=(1.0, 1.0),
        rrc_ratio=(80 / 60, 80 / 60),
        hflip_prob=0.0,
        vflip_prob=0.0,
        ssr_prob=0.0,
        distortion=G.DistortionCfg(prob=0.0),
    )
    out = np.asarray(
        G.geometric_augment(jnp.asarray(img), jax.random.key(1), (120, 160), cfg)
    )
    ref = cv2.resize(img[0], (160, 120), interpolation=cv2.INTER_LINEAR)
    # Edge rows/cols differ by design: cv2.resize clamps the half-pixel
    # overhang at borders while the fused warp uses reflect-101 (the border
    # mode of the geometric chain it implements). Interior must match.
    np.testing.assert_allclose(out[0, 1:-1, 1:-1], ref[1:-1, 1:-1], atol=0.6)


def test_hflip(rng):
    img = rng.integers(0, 256, size=(1, 60, 80, 3)).astype(np.float32)
    cfg = G.GeometryCfg(
        rrc_scale=(1.0, 1.0),
        rrc_ratio=(80 / 60, 80 / 60),
        hflip_prob=1.0,
        vflip_prob=0.0,
        ssr_prob=0.0,
        distortion=G.DistortionCfg(prob=0.0),
    )
    out = np.asarray(
        G.geometric_augment(jnp.asarray(img), jax.random.key(2), (60, 80), cfg)
    )
    np.testing.assert_allclose(out[0], img[0, :, ::-1], atol=1e-3)


def test_vflip(rng):
    img = rng.integers(0, 256, size=(1, 60, 80, 3)).astype(np.float32)
    cfg = G.GeometryCfg(
        rrc_scale=(1.0, 1.0),
        rrc_ratio=(80 / 60, 80 / 60),
        hflip_prob=0.0,
        vflip_prob=1.0,
        ssr_prob=0.0,
        distortion=G.DistortionCfg(prob=0.0),
    )
    out = np.asarray(
        G.geometric_augment(jnp.asarray(img), jax.random.key(3), (60, 80), cfg)
    )
    np.testing.assert_allclose(out[0], img[0, ::-1], atol=1e-3)


def test_rrc_crops_are_valid_boxes():
    key = jax.random.key(0)
    mats = G.random_resized_crop_matrix(
        key, 512, (60, 80), (260, 260), (0.8, 1.0), (0.75, 4 / 3)
    )
    mats = np.asarray(mats)
    # crop corners: src coords of output corners must lie within the image
    sx, sy = mats[:, 0, 0], mats[:, 1, 1]
    x0 = mats[:, 0, 2] - 0.5 * sx + 0.5
    y0 = mats[:, 1, 2] - 0.5 * sy + 0.5
    w = sx * 260
    h = sy * 260
    assert (w <= 80 + 1e-3).all() and (h <= 60 + 1e-3).all()
    assert (x0 >= -1e-3).all() and (y0 >= -1e-3).all()
    assert (x0 + w <= 80 + 1e-3).all() and (y0 + h <= 60 + 1e-3).all()
    # area fractions within the configured scale range
    area_frac = (w * h) / (60 * 80)
    assert (area_frac >= 0.8 - 1e-3).all() and (area_frac <= 1.0 + 1e-3).all()


def test_ssr_prob_zero_is_identity():
    m = G.shift_scale_rotate_inverse_matrix(
        jax.random.key(0), 16, (260, 260), 0.0, 0.1, 0.2, 30.0
    )
    np.testing.assert_allclose(
        np.asarray(m), np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-5
    )


def test_grid_distortion_map_properties():
    cfg = G.DistortionCfg(grid_distort_limit=0.1, grid_num_steps=5)
    m = np.asarray(G.grid_distortion_map(jax.random.key(0), 4, (260, 260), cfg))
    xs = m[..., 0]
    # endpoints map to endpoints, map monotone in x, bounded displacement
    np.testing.assert_allclose(xs[:, 0, 0], 0.0, atol=1e-4)
    np.testing.assert_allclose(xs[:, 0, -1], 259.0, atol=1e-3)
    assert (np.diff(xs[:, 0, :], axis=-1) > 0).all()
    assert np.abs(xs - np.arange(260)[None, None, :]).max() < 260 * 0.1


def test_optical_distortion_identity_at_zero_k():
    cfg = G.DistortionCfg(optical_distort_limit=0.0, optical_shift_limit=0.0)
    m = np.asarray(G.optical_distortion_map(jax.random.key(0), 2, (64, 64), cfg))
    grid = np.asarray(G.output_grid(64, 64))
    np.testing.assert_allclose(m[0], grid, atol=1e-4)


def test_elastic_map_small_displacement():
    cfg = G.DistortionCfg(elastic_alpha=1.0, elastic_sigma=50.0)
    m = np.asarray(G.elastic_map(jax.random.key(0), 2, (260, 260), cfg))
    grid = np.asarray(G.output_grid(260, 260))[None]
    disp = np.abs(m - grid)
    assert disp.max() < 1.0  # alpha=1 -> sub-pixel field
    assert disp.max() > 0.0


def test_distortion_oneof_gate():
    cfg = G.DistortionCfg(prob=0.0)
    m = np.asarray(G.distortion_source_map(jax.random.key(0), 2, (32, 32), cfg))
    grid = np.asarray(G.output_grid(32, 32))
    np.testing.assert_allclose(m[0], grid, atol=1e-6)


def test_geometric_augment_randomized_stats():
    """Augmented outputs differ per sample and stay in range."""
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(8, 60, 80, 3)).astype(np.float32)
    out = np.asarray(
        G.geometric_augment(
            jnp.asarray(img), jax.random.key(7), (260, 260), G.GeometryCfg()
        )
    )
    assert out.shape == (8, 260, 260, 3)
    assert out.min() >= 0.0 and out.max() <= 255.0
    # different samples get different transforms
    assert np.abs(out[0] - out[1]).mean() > 1.0
