import jax
import jax.numpy as jnp
import numpy as np

from image_classification_tpu.aug.erase import EraseCfg, coarse_dropout
from image_classification_tpu.aug.mix import MixCfg, mixup_cutmix_batch, one_hot_labels
from image_classification_tpu.aug.pipeline import normalize


def test_coarse_dropout_prob_zero(rng):
    img = rng.uniform(0, 255, size=(2, 64, 64, 3)).astype(np.float32)
    out = np.asarray(
        coarse_dropout(jnp.asarray(img), jax.random.key(0), EraseCfg(prob=0.0))
    )
    np.testing.assert_array_equal(out, img)


def test_coarse_dropout_holes(rng):
    img = rng.uniform(100, 255, size=(8, 64, 64, 3)).astype(np.float32)
    out = np.asarray(
        coarse_dropout(jnp.asarray(img), jax.random.key(1), EraseCfg(prob=1.0))
    )
    for b in range(8):
        zeros = (out[b] == 0).all(axis=-1)
        n_zero = zeros.sum()
        # holes are 4..8 px per side, 1..8 holes -> 16..512 px erased
        assert 16 <= n_zero <= 8 * 8 * 8
        # erased pixels form rectangles: rows with zeros have contiguous runs
        assert (out[b][~zeros] > 0).all()


def test_one_hot():
    oh = np.asarray(one_hot_labels(jnp.array([0, 3]), 5))
    np.testing.assert_array_equal(oh, [[1, 0, 0, 0, 0], [0, 0, 0, 1, 0]])


def test_mix_prob_zero_returns_onehot(rng):
    img = rng.uniform(size=(4, 16, 16, 3)).astype(np.float32)
    labels = jnp.array([1, 2, 3, 4])
    cfg = MixCfg(prob=0.0, num_classes=10)
    out_img, out_lab = mixup_cutmix_batch(jnp.asarray(img), labels, jax.random.key(0), cfg)
    np.testing.assert_array_equal(np.asarray(out_img), img)
    np.testing.assert_array_equal(
        np.asarray(out_lab), np.asarray(one_hot_labels(labels, 10))
    )


def test_mix_labels_are_distributions(rng):
    img = rng.uniform(size=(32, 16, 16, 3)).astype(np.float32)
    labels = jnp.arange(32) % 10
    cfg = MixCfg(prob=1.0, num_classes=10)
    _, out_lab = mixup_cutmix_batch(jnp.asarray(img), labels, jax.random.key(1), cfg)
    lab = np.asarray(out_lab)
    np.testing.assert_allclose(lab.sum(axis=1), 1.0, rtol=1e-5)
    # mixed labels have at most two nonzero entries
    assert ((lab > 1e-6).sum(axis=1) <= 2).all()


def test_cutmix_lambda_matches_pixel_area(rng):
    """Exact-area correction (`dataset.py:152`): the label weight of the
    original sample must equal the unpasted pixel fraction."""
    img = jnp.zeros((64, 32, 32, 3))
    img2_marker = jnp.arange(64, dtype=jnp.float32)[:, None, None, None] + 1.0
    img = img + img2_marker  # sample b is constant (b+1)
    labels = jnp.arange(64) % 44
    cfg = MixCfg(mixup_alpha=0.0, cutmix_alpha=1.0, prob=1.0, num_classes=44)
    out_img, out_lab = mixup_cutmix_batch(img, labels, jax.random.key(2), cfg)
    out_img = np.asarray(out_img)
    out_lab = np.asarray(out_lab)
    labels = np.asarray(labels)
    for b in range(64):
        own = (out_img[b, :, :, 0] == b + 1).mean()
        own_weight = out_lab[b, labels[b]]
        partner_cls = np.argmax(out_lab[b] - 0.5 * (np.arange(44) == labels[b]))
        if not np.isclose(own, 1.0):  # actually pasted something
            np.testing.assert_allclose(own_weight, own, atol=1 / (32 * 32) + 1e-5)


def test_mixup_pixel_lerp(rng):
    imgs = np.stack(
        [np.full((8, 8, 3), 0, np.float32), np.full((8, 8, 3), 100, np.float32)]
    )
    labels = jnp.array([0, 1])
    cfg = MixCfg(mixup_alpha=0.2, cutmix_alpha=0.0, prob=1.0, num_classes=2)
    # force the mixup branch by running until a key gives both mixed
    out_img, out_lab = mixup_cutmix_batch(jnp.asarray(imgs), labels, jax.random.key(5), cfg)
    out_img = np.asarray(out_img)
    out_lab = np.asarray(out_lab)
    for b in range(2):
        # pixel value must be consistent with the label weights
        lam0 = out_lab[b, 0]
        expected = 0 * lam0 + 100 * (1 - lam0) if b == 0 else 100 * lam0 + 0 * (1 - lam0)
        # only check when mixed with the other sample
        if not np.allclose(out_img[b], imgs[b]):
            np.testing.assert_allclose(out_img[b], expected, atol=0.2)


def test_mix_commutes_with_normalize(rng):
    """Mixing after normalize (ours) == mixing before normalize (reference)."""
    img = rng.uniform(0, 255, size=(8, 8, 8, 3)).astype(np.float32)
    labels = jnp.arange(8) % 4
    cfg = MixCfg(prob=1.0, num_classes=4)
    key = jax.random.key(3)
    mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)
    a_img, a_lab = mixup_cutmix_batch(
        normalize(jnp.asarray(img), mean, std), labels, key, cfg
    )
    b_img, b_lab = mixup_cutmix_batch(jnp.asarray(img), labels, key, cfg)
    np.testing.assert_allclose(
        np.asarray(a_img), np.asarray(normalize(b_img, mean, std)), atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(a_lab), np.asarray(b_lab))


def test_beta_distribution_mean():
    lam = np.asarray(jax.random.beta(jax.random.key(0), 0.2, 0.2, (5000,)))
    assert abs(lam.mean() - 0.5) < 0.03
    # Beta(0.2, 0.2) is bimodal at the ends
    assert (lam < 0.1).mean() > 0.3
