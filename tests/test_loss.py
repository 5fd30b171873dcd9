import numpy as np
import pytest
import torch
import torch.nn.functional as tF

import jax.numpy as jnp

from image_classification_tpu.core.config import Config
from image_classification_tpu.train.loss import (
    build_criterion,
    deep_supervision_loss,
    focal_loss,
    smoothed_cross_entropy,
    soft_target_cross_entropy,
)


@pytest.fixture
def logits_labels(rng):
    logits = rng.normal(size=(16, 44)).astype(np.float32)
    labels = rng.integers(0, 44, size=16)
    return logits, labels


def test_smoothed_ce_matches_torch(logits_labels):
    logits, labels = logits_labels
    ours = float(smoothed_cross_entropy(jnp.asarray(logits), jnp.asarray(labels), 0.1))
    ref = float(
        tF.cross_entropy(torch.tensor(logits), torch.tensor(labels), label_smoothing=0.1)
    )
    assert ours == pytest.approx(ref, rel=1e-5)


def test_plain_ce_matches_torch(logits_labels):
    logits, labels = logits_labels
    ours = float(smoothed_cross_entropy(jnp.asarray(logits), jnp.asarray(labels), 0.0))
    ref = float(tF.cross_entropy(torch.tensor(logits), torch.tensor(labels)))
    assert ours == pytest.approx(ref, rel=1e-5)


def test_soft_target_ce_matches_torch(logits_labels, rng):
    logits, _ = logits_labels
    t = rng.dirichlet(np.ones(44), size=16).astype(np.float32)
    ours = float(
        soft_target_cross_entropy(jnp.asarray(logits), jnp.asarray(t), 0.1)
    )
    ref = float(
        tF.cross_entropy(torch.tensor(logits), torch.tensor(t), label_smoothing=0.1)
    )
    assert ours == pytest.approx(ref, rel=1e-5)


def test_weighted_ce_matches_torch(logits_labels, rng):
    logits, labels = logits_labels
    w = rng.uniform(0.5, 2.0, size=44).astype(np.float32)
    ours = float(
        smoothed_cross_entropy(
            jnp.asarray(logits), jnp.asarray(labels), 0.0, jnp.asarray(w)
        )
    )
    ref = float(
        tF.cross_entropy(torch.tensor(logits), torch.tensor(labels),
                         weight=torch.tensor(w))
    )
    assert ours == pytest.approx(ref, rel=1e-5)


def test_focal_loss_matches_reference_formula(logits_labels):
    """`V3.1/utils.py:39-61`: (1-pt)^gamma * CE."""
    logits, labels = logits_labels
    ours = float(focal_loss(jnp.asarray(logits), jnp.asarray(labels), gamma=2.0))
    ce = tF.cross_entropy(torch.tensor(logits), torch.tensor(labels), reduction="none")
    pt = torch.exp(-ce)
    ref = float(((1 - pt) ** 2.0 * ce).mean())
    assert ours == pytest.approx(ref, rel=1e-5)


def test_deep_supervision_loss_weights(logits_labels):
    """0.6*main + (0.4/n)*sum(aux) (`train_advanced_v4.py:153-181`)."""
    logits, labels = logits_labels
    outs = [jnp.asarray(logits), jnp.asarray(logits * 2), jnp.asarray(logits * 3)]
    l = jnp.asarray(labels)
    total = float(deep_supervision_loss(outs, l, main_weight=0.6, smoothing=0.1))
    parts = [float(smoothed_cross_entropy(o, l, 0.1)) for o in outs]
    expected = 0.6 * parts[0] + 0.2 * parts[1] + 0.2 * parts[2]
    assert total == pytest.approx(expected, rel=1e-5)


def test_deep_supervision_argmax_quirk(logits_labels, rng):
    """Soft targets are argmaxed back to indices before the smoothed CE —
    the reference's mixup-discarding quirk (`train_advanced_v4.py:166-167`)."""
    logits, labels = logits_labels
    soft = np.zeros((16, 44), np.float32)
    soft[np.arange(16), labels] = 0.7
    soft[np.arange(16), (labels + 1) % 44] = 0.3
    outs = [jnp.asarray(logits)]
    quirk = float(deep_supervision_loss(outs, jnp.asarray(soft), smoothing=0.1))
    hard = float(smoothed_cross_entropy(jnp.asarray(logits), jnp.asarray(labels), 0.1))
    assert quirk == pytest.approx(hard, rel=1e-6)
    fixed = float(
        deep_supervision_loss(outs, jnp.asarray(soft), smoothing=0.1, soft_targets=True)
    )
    assert fixed != pytest.approx(hard, rel=1e-4)


def test_build_criterion_dispatch(logits_labels):
    logits, labels = logits_labels
    l, lab = jnp.asarray(logits), jnp.asarray(labels)
    cfg = Config(use_deep_supervision=False)
    assert float(build_criterion(cfg)(l, lab)) == pytest.approx(
        float(smoothed_cross_entropy(l, lab, 0.1)), rel=1e-6
    )
    cfg_f = Config(use_focal_loss=True, use_deep_supervision=False)
    assert float(build_criterion(cfg_f)(l, lab)) == pytest.approx(
        float(focal_loss(l, lab, 2.0)), rel=1e-6
    )
    cfg_ds = Config(use_deep_supervision=True)
    outs = (l, l * 2, l * 3, l)
    v = float(build_criterion(cfg_ds)(outs, lab))
    assert np.isfinite(v)


def test_schedule_matches_reference_lambda():
    """Quirk check: min_lr floors the multiplier (`train_advanced_v4.py:183-191`)."""
    import math

    from image_classification_tpu.train.schedule import warmup_cosine_schedule

    base_lr, warm, total = 1e-4, 100, 1000
    sched = warmup_cosine_schedule(base_lr, warm, total, 1e-6)

    def ref_lambda(step):
        if step < warm:
            return step / max(1, warm)
        progress = (step - warm) / max(1, total - warm)
        return max(1e-6, 0.5 * (1 + math.cos(math.pi * progress)))

    for step in [0, 1, 50, 99, 100, 101, 500, 999, 1000, 1500]:
        assert float(sched(step)) == pytest.approx(base_lr * ref_lambda(step), rel=1e-5)
    # at the end, lr floor is base_lr * 1e-6 (the quirk), not 1e-6
    assert float(sched(total)) == pytest.approx(1e-4 * 1e-6, rel=1e-4)


def test_schedule_horizon_sizing():
    """The final-optimizer-step LR in both horizon modes (ADVICE r1 high).

    count advances once per optimizer step; training runs
    steps_per_epoch*epochs optimizer steps. 'microbatches' (parity) must end
    mid-cosine at progress 1/accum; 'steps' must complete the full cosine.
    """
    import math

    from image_classification_tpu.core.config import Config
    from image_classification_tpu.train.loop import build_lr_schedule

    steps_per_epoch, epochs, accum, lr = 50, 4, 2, 1e-4
    final_count = steps_per_epoch * epochs  # optimizer steps actually taken

    cfg_mb = Config(
        epochs=epochs, gradient_accumulation_steps=accum, lr=lr,
        warmup_ratio=0.1, schedule_horizon="microbatches",
    )
    sched = build_lr_schedule(cfg_mb, steps_per_epoch)
    total = steps_per_epoch * epochs * accum
    warm = int(total * 0.1)
    progress = (final_count - warm) / (total - warm)  # = ~1/accum region
    expect = lr * max(1e-6, 0.5 * (1 + math.cos(math.pi * progress)))
    assert float(sched(final_count)) == pytest.approx(expect, rel=1e-5)
    # mid-cosine: LR must still be a substantial fraction of base, NOT floored
    assert float(sched(final_count)) > 0.3 * lr

    cfg_steps = cfg_mb.replace(schedule_horizon="steps")
    sched_s = build_lr_schedule(cfg_steps, steps_per_epoch)
    # full cosine: the last step sits at the multiplier floor (lr * 1e-6)
    assert float(sched_s(final_count)) == pytest.approx(lr * 1e-6, rel=1e-4)
    # ... and was NOT floored an accum-factor earlier
    assert float(sched_s(final_count // accum)) > 0.3 * lr


def test_plateau_scheduler():
    from image_classification_tpu.train.schedule import PlateauScheduler

    s = PlateauScheduler(1.0, factor=0.1, patience=2)
    assert s.step(0.5) == 1.0     # improvement
    assert s.step(0.4) == 1.0     # bad 1
    assert s.step(0.4) == 1.0     # bad 2
    assert s.step(0.4) == pytest.approx(0.1)  # bad 3 > patience -> drop
    assert s.step(0.9) == pytest.approx(0.1)  # new best, lr stays


def test_plateau_optimizer_lr_injection():
    """schedule='plateau' + set_learning_rate must change the effective LR."""
    import jax
    import optax

    from image_classification_tpu.core.config import Config
    from image_classification_tpu.train.optim import build_optimizer, set_learning_rate

    cfg = Config(schedule="plateau", lr=0.1, gradient_clip_val=1.0)
    tx = build_optimizer(cfg, cfg.lr)
    params = {"w": jnp.ones((4,))}
    opt_state = tx.init(params)
    grads = {"w": jnp.full((4,), 0.01)}

    u1, st = tx.update(grads, opt_state, params)
    opt_state2 = set_learning_rate(opt_state, 0.001)
    u2, _ = tx.update(grads, opt_state2, params)
    # AdamW normalizes gradient magnitude, so update scales ~ with LR
    ratio = float(jnp.abs(u1["w"][0]) / jnp.abs(u2["w"][0]))
    assert ratio == pytest.approx(100.0, rel=0.05)
