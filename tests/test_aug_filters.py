import cv2
import jax
import jax.numpy as jnp
import numpy as np

from image_classification_tpu.aug import filters as F


def test_gaussian_kernel_matches_cv2():
    for k in (3, 5, 7):
        ours = np.asarray(F.gaussian_kernels(jnp.array([k])))[0]
        g1 = cv2.getGaussianKernel(k, 0)  # sigma=0 -> OpenCV's ksize rule
        ref = (g1 @ g1.T).astype(np.float32)
        pad = (F.MAX_K - k) // 2
        padded = np.zeros((F.MAX_K, F.MAX_K), np.float32)
        padded[pad : pad + k, pad : pad + k] = ref
        np.testing.assert_allclose(ours, padded, atol=2e-3)


def test_motion_kernel_properties():
    ks = jnp.array([3, 5, 7, 7])
    kern = np.asarray(F.motion_kernels(jax.random.key(0), ks))
    np.testing.assert_allclose(kern.sum(axis=(1, 2)), 1.0, rtol=1e-5)
    assert (kern >= 0).all()
    # k=3 kernel has no mass outside its 3x3 center
    outer = kern[0].copy()
    outer[2:5, 2:5] = 0
    assert outer.sum() < 1e-6


def test_depthwise_conv_matches_cv2_filter2d(rng):
    img = rng.uniform(0, 255, size=(2, 32, 40, 3)).astype(np.float32)
    kern = rng.uniform(0, 1, size=(2, 7, 7)).astype(np.float32)
    kern /= kern.sum(axis=(1, 2), keepdims=True)
    ours = np.asarray(F.depthwise_conv_per_sample(jnp.asarray(img), jnp.asarray(kern)))
    for b in range(2):
        # cv2.filter2D correlates (no kernel flip), as does lax conv
        ref = cv2.filter2D(img[b], -1, kern[b], borderType=cv2.BORDER_REFLECT_101)
        np.testing.assert_allclose(ours[b], ref, atol=1e-2)


def test_noise_blur_prob_zero_identity(rng):
    img = rng.uniform(0, 255, size=(2, 16, 16, 3)).astype(np.float32)
    out = np.asarray(
        F.noise_blur_oneof(
            jnp.asarray(img), jax.random.key(0), F.NoiseBlurCfg(prob=0.0)
        )
    )
    np.testing.assert_allclose(out, img, atol=1e-3)


def test_noise_branch_statistics():
    img = jnp.full((64, 16, 16, 3), 128.0)
    cfg = F.NoiseBlurCfg(prob=1.0, gauss_noise_var=(25.0, 25.0))
    out = np.asarray(F.noise_blur_oneof(img, jax.random.key(1), cfg))
    diff = out - 128.0
    # ~1/3 of samples got pure noise with std 5
    noisy = [b for b in range(64) if 3 < diff[b].std() < 7]
    assert len(noisy) > 10


def test_blur_branch_smooths(rng):
    img = rng.uniform(0, 255, size=(64, 16, 16, 3)).astype(np.float32)
    cfg = F.NoiseBlurCfg(prob=1.0, gauss_noise_var=(0.0, 1e-6))
    out = np.asarray(F.noise_blur_oneof(jnp.asarray(img), jax.random.key(2), cfg))
    # blurred samples have lower total variation than the originals
    def tv(x):
        return np.abs(np.diff(x, axis=1)).mean() + np.abs(np.diff(x, axis=2)).mean()

    assert tv(out) < tv(img)
