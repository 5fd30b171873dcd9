"""Cross-framework inference parity: identical weights, identical test set,
identical submission.

The reference's standalone test path (`testdata.py:83-106,166-173`) reads
each test JPEG with cv2, applies the *eval* transform chain — A.Resize
(cv2 INTER_LINEAR) + A.Normalize(imagenet) + ToTensorV2 (`dataset.py:242-256`)
— runs the model (``outputs[0]`` for deep-supervised lists), softmaxes,
ensemble-averages (`train_advanced_v4.py:349-381`), argmaxes, and writes an
``id,predict`` CSV. This test rebuilds that exact path functionally in torch
from a timm-style state dict, imports the same state dict into our flax
model, runs our real loader + ``predict_ensemble`` + ``write_submission``
end-to-end, and asserts the predictions — and the submission file bytes —
are identical. The scale4 TTA variant replicates `test_time_augmentation`
(`train_advanced_v4.py:317-347`): identity, hflip, 0.9x/1.1x resize +
CenterCrop (zero pad), softmax-mean.

Resize convention (documented in PARITY.md §inference): albumentations
resizes the *uint8* image, so our eval path rounds the float resize output
back to uint8 before Normalize (``cfg.eval_resize_uint8``, default on).
The residue vs cv2's fixed-point uint8 resize is a ±1-level difference on
~6% of pixels (cv2's 11-bit coefficient quantization); the measured
softmax-probability delta on this test set is ~1e-3 (asserted < 3e-3) and
argmax is identical.
"""

import os

import cv2
import numpy as np
import pandas as pd
import pytest
import torch
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from image_classification_tpu.core.config import Config
from image_classification_tpu.data import DataLoader, Manifest
from image_classification_tpu.data.sampling import SequentialSampler
from image_classification_tpu.data.source import ImageSource
from image_classification_tpu.data.synthetic import synthetic_images
from image_classification_tpu.infer import predict_ensemble, write_submission
from image_classification_tpu.models.convnext import ConvNeXt
from image_classification_tpu.models.factory import ModelBundle
from image_classification_tpu.models.pretrained import import_convnext

from test_pretrained import (
    DEPTHS,
    DIMS,
    NUM_CLASSES,
    make_timm_convnext_state_dict,
    torch_convnext_forward,
)

NATIVE = (24, 32)
IMAGE_SIZE = (32, 32)
MEAN = (0.485, 0.456, 0.406)
STD = (0.229, 0.224, 0.225)
N_TEST = 48


@pytest.fixture(scope="module")
def test_set(tmp_path_factory):
    root = tmp_path_factory.mktemp("parity_data")
    test_dir = os.path.join(str(root), "test")
    os.makedirs(test_dir)
    labels = np.arange(N_TEST) % NUM_CLASSES
    imgs = synthetic_images(labels, NATIVE, seed=3)
    ids = [f"pt{i:04d}" for i in range(N_TEST)]
    for i, id_ in enumerate(ids):
        cv2.imwrite(
            os.path.join(test_dir, f"{id_}.jpg"),
            cv2.cvtColor(imgs[i], cv2.COLOR_RGB2BGR),
        )
    csv = os.path.join(str(root), "sample_submission.csv")
    pd.DataFrame({"id": ids, "predict": 0}).to_csv(csv, index=False)
    return {"dir": test_dir, "csv": csv, "ids": ids, "root": str(root)}


def _reference_batch(test_dir, ids):
    """cv2.imread -> BGR2RGB -> A.Resize(INTER_LINEAR, uint8) ->
    A.Normalize -> ToTensorV2 (`dataset.py:242-256`)."""
    mean = np.array(MEAN) * 255.0
    std = np.array(STD) * 255.0
    batch = []
    for id_ in ids:
        img = cv2.imread(os.path.join(test_dir, f"{id_}.jpg"))
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        img = cv2.resize(
            img, (IMAGE_SIZE[1], IMAGE_SIZE[0]), interpolation=cv2.INTER_LINEAR
        )
        x = (img.astype(np.float32) - mean) / std
        batch.append(x.transpose(2, 0, 1))
    return torch.tensor(np.stack(batch), dtype=torch.float32)


def _torch_center_crop_pad(x, out_hw):
    """torchvision CenterCrop semantics: zero-pad when smaller, crop when
    larger (`train_advanced_v4.py:335-339`)."""
    _, _, H, W = x.shape
    Ho, Wo = out_hw
    ph, pw = max(0, Ho - H), max(0, Wo - W)
    if ph or pw:
        x = tF.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2))
        _, _, H, W = x.shape
    y0, x0 = (H - Ho) // 2, (W - Wo) // 2
    return x[:, :, y0 : y0 + Ho, x0 : x0 + Wo]


def _reference_probs(sds, x, tta: bool):
    """`predict` (`train_advanced_v4.py:349-381`): per-model softmax
    (TTA-averaged when enabled), then unweighted mean across models."""
    per_model = []
    for sd in sds:
        if not tta:
            per_model.append(torch_convnext_forward(sd, x).softmax(1))
            continue
        views = [x, torch.flip(x, dims=[3])]
        for scale in (0.9, 1.1):
            size = (int(IMAGE_SIZE[0] * scale), int(IMAGE_SIZE[1] * scale))
            # torchvision transforms.Resize on tensors (reference env):
            # bilinear, half-pixel, no antialias
            aug = tF.interpolate(
                x, size=size, mode="bilinear", align_corners=False,
                antialias=False,
            )
            views.append(_torch_center_crop_pad(aug, IMAGE_SIZE))
        preds = [torch_convnext_forward(sd, v).softmax(1) for v in views]
        per_model.append(torch.stack(preds).mean(0))
    return torch.stack(per_model).mean(0).detach().numpy()


def _our_setup(test_set, tta_transforms: int):
    cfg = Config(
        num_classes=NUM_CLASSES,
        native_size=NATIVE,
        image_size=IMAGE_SIZE,
        compute_dtype="float32",
        batch_size=16,
        infer_batch_multiplier=1,
        tta_transforms=tta_transforms,
        tta_mode="scale4",
        use_decode_cache=False,
        mean=MEAN,
        std=STD,
    )
    model = ConvNeXt(
        num_classes=NUM_CLASSES, depths=DEPTHS, dims=DIMS, dtype=jnp.float32
    )
    bundle = ModelBundle(
        name="convnext_parity",
        module=model,
        deep_supervised=False,
        has_batch_stats=False,
        input_size=IMAGE_SIZE,
    )
    manifest = Manifest.from_csv(test_set["csv"], is_test=True)
    source = ImageSource(
        test_set["dir"], manifest.ids, native_size=NATIVE, cache_dir=None
    )
    loader = DataLoader(
        source,
        manifest,
        batch_size=cfg.batch_size * cfg.infer_batch_multiplier,
        sampler=SequentialSampler(len(manifest)),
        pad_last=True,
    )
    return cfg, bundle, loader


def _import_variables(sd, cfg):
    model = ConvNeXt(
        num_classes=NUM_CLASSES, depths=DEPTHS, dims=DIMS, dtype=jnp.float32
    )
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, *IMAGE_SIZE, 3), jnp.float32)
    )
    sd_np = {k: v.numpy() for k, v in sd.items()}
    params, n = import_convnext(sd_np, variables["params"])
    assert n == len(sd)
    return {"params": params}


@pytest.mark.parametrize("tta", [False, True], ids=["tta_off", "tta_scale4"])
def test_single_model_inference_parity(test_set, tta):
    sd = make_timm_convnext_state_dict(seed=0)
    cfg, bundle, loader = _our_setup(test_set, tta_transforms=4 if tta else 0)
    variables = _import_variables(sd, cfg)

    ids, preds, probs = predict_ensemble([bundle], [variables], loader, cfg)
    assert list(ids) == test_set["ids"]

    x_ref = _reference_batch(test_set["dir"], test_set["ids"])
    ref_probs = _reference_probs([sd], x_ref, tta)
    ref_preds = ref_probs.argmax(1)

    delta = np.abs(probs - ref_probs).max()
    assert delta < 3e-3, f"softmax probability delta {delta}"
    np.testing.assert_array_equal(preds, ref_preds)

    # byte-identical submission CSVs
    ours = os.path.join(test_set["root"], f"sub_ours_{tta}.csv")
    theirs = os.path.join(test_set["root"], f"sub_ref_{tta}.csv")
    write_submission(ids, preds, ours, column="predict")
    pd.DataFrame({"id": list(ids), "predict": ref_preds}).to_csv(
        theirs, index=False
    )  # `testdata.py:166-173`
    with open(ours, "rb") as a, open(theirs, "rb") as b:
        assert a.read() == b.read()


def test_two_model_ensemble_parity(test_set):
    """Unweighted ensemble mean across fold models
    (`train_advanced_v4.py:372-374`)."""
    sds = [make_timm_convnext_state_dict(seed=s) for s in (0, 7)]
    cfg, bundle, loader = _our_setup(test_set, tta_transforms=0)
    var_list = [_import_variables(sd, cfg) for sd in sds]

    ids, preds, probs = predict_ensemble(
        [bundle, bundle], var_list, loader, cfg
    )
    ref_probs = _reference_probs(
        sds, _reference_batch(test_set["dir"], test_set["ids"]), tta=False
    )
    assert np.abs(probs - ref_probs).max() < 3e-3
    np.testing.assert_array_equal(preds, ref_probs.argmax(1))


def test_trained_exported_checkpoint_torch_parity(test_set, tmp_path):
    """Full cross-ecosystem round trip from a REAL trained checkpoint: a
    few AdamW steps on the flax model -> saved/reloaded through the real
    orbax best-checkpoint path (`utils/checkpoint.py`) -> exported to a
    timm-keyed state dict (`export_convnext`, the format
    `testdata.py:140-159` consumes) -> the torch replica of the
    reference's eval (`testdata.py:83-106,166-173`) runs THAT export ->
    submission CSV byte-identical with our own predict path run from the
    reloaded checkpoint."""
    import optax

    from image_classification_tpu.models.pretrained import export_convnext
    from image_classification_tpu.utils import checkpoint as ckpt

    cfg, bundle, loader = _our_setup(test_set, tta_transforms=0)
    model = bundle.module
    variables = model.init(
        jax.random.key(11), jnp.zeros((1, *IMAGE_SIZE, 3), jnp.float32)
    )
    params = variables["params"]
    tx = optax.adamw(3e-4)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, x, y):
        def loss_fn(p):
            logits = model.apply({"params": p}, x)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y
            ).mean()

        grads = jax.grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    rng = np.random.default_rng(5)
    for _ in range(4):
        x = jnp.asarray(
            rng.uniform(-2, 2, size=(8, *IMAGE_SIZE, 3)).astype(np.float32)
        )
        y = jnp.asarray(rng.integers(0, NUM_CLASSES, size=8))
        params, opt_state = train_step(params, opt_state, x, y)

    save_dir = str(tmp_path / "models")
    ckpt.save_best(save_dir, 1, jax.device_get(params), None, val_acc=0.5)
    tree, meta = ckpt.load_best(save_dir, 1, {"params": params})
    assert meta["val_acc"] == 0.5

    sd_np = export_convnext(tree["params"], DEPTHS, DIMS)
    sd = {k: torch.tensor(np.asarray(v)) for k, v in sd_np.items()}

    ids, preds, probs = predict_ensemble([bundle], [tree], loader, cfg)
    x_ref = _reference_batch(test_set["dir"], test_set["ids"])
    ref_probs = _reference_probs([sd], x_ref, tta=False)
    ref_preds = ref_probs.argmax(1)

    # Raw-forward parity of the export mapping is exact (~7e-7 logits,
    # measured); the visible delta here is the documented uint8-resize
    # residue (PARITY.md §inference) amplified by a TRAINED model's
    # sharper softmax — hence a looser bound than the random-weight tests,
    # with argmax and the CSV bytes still required identical.
    assert np.abs(probs - ref_probs).max() < 2e-2
    np.testing.assert_array_equal(preds, ref_preds)

    ours = os.path.join(test_set["root"], "sub_ours_export.csv")
    theirs = os.path.join(test_set["root"], "sub_ref_export.csv")
    write_submission(ids, preds, ours, column="predict")
    pd.DataFrame({"id": list(ids), "predict": ref_preds}).to_csv(
        theirs, index=False
    )
    with open(ours, "rb") as a, open(theirs, "rb") as b:
        assert a.read() == b.read()
