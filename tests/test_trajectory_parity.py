"""Training-trajectory parity vs torch (the reference framework).

Builds the SAME tiny ConvNeXt in torch and in this framework from identical
weights (via models/pretrained.py import), feeds both identical pre-augmented
batches, and runs ~100 optimizer steps of the reference V4 step semantics
(`train_advanced_v4.py:193-281`): CE(label_smoothing=0.1), grad accumulation
x2 with the AMP-path *summed* (undivided) reduction (`:223-244`),
global-norm clip 1.0 (`:226-229`), AdamW (`:504-510`), the hand-rolled
warmup+cosine LambdaLR with its min_lr multiplier-floor quirk (`:183-191`)
sized in microbatches (`:628-634`), and per-step EMA (`:62-94`, `:236-237`).

Loss and parameter trajectories must track within f32 tolerance — this is
the locally-feasible stand-in for the reference's val-accuracy oracle
(91.5% +-0.3pt, `README.md:73`): if step semantics drift, this fails.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from image_classification_tpu.core.config import Config
from image_classification_tpu.models.convnext import ConvNeXt
from image_classification_tpu.models.factory import ModelBundle
from image_classification_tpu.models.pretrained import import_convnext
from image_classification_tpu.train.loop import build_lr_schedule
from image_classification_tpu.train.loss import build_criterion
from image_classification_tpu.train.optim import build_optimizer
from image_classification_tpu.train.step import make_train_step
from image_classification_tpu.train.train_state import create_train_state
from tests.test_pretrained import (
    DEPTHS,
    DIMS,
    NUM_CLASSES,
    make_timm_convnext_state_dict,
    torch_convnext_forward,
)

B = 8            # global batch
ACCUM = 2        # reference config.py:37
N_STEPS = 100    # optimizer steps
STEPS_PER_EPOCH, EPOCHS = 25, 4   # horizon: 100 opt steps, 200 microbatches
LR, WD, CLIP = 1e-3, 1e-2, 1.0
SMOOTHING = 0.1
EMA_DECAY = 0.99  # faster-moving than .9997 so the EMA comparison has signal
IMG = 32


class TorchConvNeXt(torch.nn.Module):
    """timm-keyed parameter bag + the functional forward (autograd-capable)."""

    def __init__(self, sd):
        super().__init__()
        self.p = torch.nn.ParameterDict(
            {k.replace(".", "|"): torch.nn.Parameter(v.clone()) for k, v in sd.items()}
        )

    def state(self):
        return {k.replace("|", "."): v for k, v in self.p.items()}

    def forward(self, x):
        return torch_convnext_forward(self.state(), x)


def ref_lambda(count, warm, total):
    """The reference LambdaLR (`train_advanced_v4.py:183-191`)."""
    import math

    if count < warm:
        return count / max(1, warm)
    progress = (count - warm) / max(1, total - warm)
    return max(1e-6, 0.5 * (1 + math.cos(math.pi * progress)))


def run_torch(sd, images, labels):
    """The reference V4 train loop, AMP-sum semantics, fp32."""
    model = TorchConvNeXt(sd)
    opt = torch.optim.AdamW(model.parameters(), lr=LR, weight_decay=WD)
    total_mb = STEPS_PER_EPOCH * EPOCHS * ACCUM
    warm = int(total_mb * 0.1)
    sched = torch.optim.lr_scheduler.LambdaLR(
        opt, lambda c: ref_lambda(c, warm, total_mb)
    )
    ema = {k: v.detach().clone() for k, v in model.state().items()}
    crit = torch.nn.CrossEntropyLoss(label_smoothing=SMOOTHING)

    losses = []
    for t in range(N_STEPS):
        x = torch.from_numpy(images[t].transpose(0, 3, 1, 2))
        y = torch.from_numpy(labels[t]).long()
        opt.zero_grad()
        step_losses = []
        for a in range(ACCUM):
            xa, ya = x[a::ACCUM], y[a::ACCUM]
            loss = crit(model(xa), ya)
            loss.backward()          # summed accumulation (AMP path, :223)
            step_losses.append(float(loss))
        torch.nn.utils.clip_grad_norm_(model.parameters(), CLIP)
        opt.step()
        sched.step()
        with torch.no_grad():
            for k, v in model.state().items():
                ema[k].mul_(EMA_DECAY).add_(v, alpha=1 - EMA_DECAY)
        losses.append(float(np.mean(step_losses)))
    params = {k: v.detach().numpy() for k, v in model.state().items()}
    return losses, params, {k: v.numpy() for k, v in ema.items()}


def run_jax(sd, images, labels):
    cfg = Config(
        num_classes=NUM_CLASSES, image_size=(IMG, IMG), native_size=(IMG, IMG),
        batch_size=B, gradient_accumulation_steps=ACCUM,
        grad_accum_reduction="sum",             # AMP-path parity
        aug_enabled=False, use_deep_supervision=False,
        compute_dtype="float32", lr=LR, weight_decay=WD,
        gradient_clip_val=CLIP, label_smoothing=SMOOTHING,
        epochs=EPOCHS, use_ema=True, ema_decay=EMA_DECAY,
        schedule="warmup_cosine", schedule_horizon="microbatches",
        warmup_ratio=0.1, mixup_alpha=0.0, cutmix_alpha=0.0,
    ).validate()
    model = ConvNeXt(num_classes=NUM_CLASSES, depths=DEPTHS, dims=DIMS,
                     dtype=jnp.float32)
    bundle = ModelBundle(
        name="tiny", module=model, deep_supervised=False,
        has_batch_stats=False, input_size=(IMG, IMG),
    )
    variables = bundle.init(jax.random.key(0))
    params, n = import_convnext({k: v.numpy() for k, v in sd.items()},
                                variables["params"])
    assert n == len(sd)
    tx = build_optimizer(cfg, build_lr_schedule(cfg, STEPS_PER_EPOCH))
    state = create_train_state({"params": params}, tx, use_ema=True)
    step = jax.jit(make_train_step(bundle, cfg, tx, build_criterion(cfg)))
    key = jax.random.key(1)  # unused paths (no aug/mix), but required

    losses = []
    for t in range(N_STEPS):
        batch = {"image": jnp.asarray(images[t]), "label": jnp.asarray(labels[t])}
        state, metrics = step(state, batch, key)
        losses.append(float(metrics["loss"]))
    return losses, jax.tree.map(np.asarray, state.params), \
        jax.tree.map(np.asarray, state.ema_params)


def _flat_l2(tree):
    leaves = jax.tree.leaves(tree)
    return np.sqrt(sum(float(np.sum(np.square(x))) for x in leaves))


@pytest.mark.slow
def test_torch_jax_trajectory_parity():
    rng = np.random.default_rng(0)
    sd = make_timm_convnext_state_dict(seed=3)
    # learnable task: class-specific pattern + noise, so the loss must drop
    pattern = rng.normal(size=(NUM_CLASSES, IMG, IMG, 3)).astype(np.float32)
    labels = rng.integers(0, NUM_CLASSES, size=(N_STEPS, B)).astype(np.int32)
    images = (
        pattern[labels]
        + 0.3 * rng.normal(size=(N_STEPS, B, IMG, IMG, 3))
    ).astype(np.float32)

    t_losses, t_params, t_ema = run_torch(sd, images, labels)
    j_losses, j_params, j_ema = run_jax(sd, images, labels)

    t_losses = np.asarray(t_losses)
    j_losses = np.asarray(j_losses)
    # early steps: near-exact; late steps: allow f32 drift accumulation
    np.testing.assert_allclose(j_losses[:20], t_losses[:20], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(j_losses, t_losses, rtol=3e-2, atol=3e-2)
    # both must have actually learned (schedule/optimizer alive)
    assert j_losses[-1] < j_losses[0] - 0.3

    # parameter trajectories: compare torch state dict vs re-exported flax
    # params through the same import mapping (reuse import to align layouts)
    model = ConvNeXt(num_classes=NUM_CLASSES, depths=DEPTHS, dims=DIMS,
                     dtype=jnp.float32)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, IMG, IMG, 3), jnp.float32))
    t_aligned, _ = import_convnext(t_params, variables["params"])
    diff = jax.tree.map(lambda a, b: a - b, t_aligned, j_params)
    rel = _flat_l2(diff) / max(_flat_l2(t_aligned), 1e-9)
    assert rel < 5e-3, f"param trajectory diverged: rel L2 {rel:.2e}"

    t_ema_aligned, _ = import_convnext(t_ema, variables["params"])
    ema_diff = jax.tree.map(lambda a, b: a - b, t_ema_aligned, j_ema)
    ema_rel = _flat_l2(ema_diff) / max(_flat_l2(t_ema_aligned), 1e-9)
    assert ema_rel < 5e-3, f"EMA trajectory diverged: rel L2 {ema_rel:.2e}"
