"""Fused clip+AdamW+EMA (train/fused.py) vs the generic optax chain.

The fused path must be a pure implementation detail: same math, same
opt_state pytree structure, interchangeable mid-run (checkpoints from one
path resume under the other). Reference semantics under test: torch AdamW +
global-norm clip + per-step EMA (`train_advanced_v4.py:226-237`).
"""

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from image_classification_tpu.core.config import Config
from image_classification_tpu.models.factory import create_model
from image_classification_tpu.train.fused import can_fuse, fused_adamw_ema
from image_classification_tpu.train.loop import build_lr_schedule
from image_classification_tpu.train.loss import build_criterion
from image_classification_tpu.train.optim import build_optimizer
from image_classification_tpu.train.step import make_train_step
from image_classification_tpu.train.train_state import create_train_state


def _ns_cfg(**kw):
    base = dict(
        adam_b1=0.9, adam_b2=0.999, adam_eps=1e-8, weight_decay=0.05,
        ema_decay=0.999, gradient_clip_val=1.0, optimizer="adamw",
        schedule="warmup_cosine", freeze_stages=0, fused_update=True,
    )
    base.update(kw)
    return SimpleNamespace(**base)


def test_fused_matches_optax_chain():
    cfg = _ns_cfg()
    sched = lambda c: 0.001 * (1 + jnp.cos(c / 50.0)) / 2
    rng = np.random.default_rng(0)
    params = {
        "a": jnp.asarray(rng.normal(size=(64, 32)), jnp.float32),
        "b": {"w": jnp.asarray(rng.normal(size=(32,)), jnp.float32)},
    }
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(sched, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.05),
    )
    o1 = o2 = tx.init(params)
    p1 = p2 = params
    e1 = e2 = jax.tree.map(jnp.copy, params)
    for _ in range(30):
        g = jax.tree.map(
            lambda p: jnp.asarray(
                rng.normal(size=p.shape, scale=3.0), jnp.float32
            ),
            params,
        )
        u, o1 = tx.update(g, o1, p1)
        p1 = optax.apply_updates(p1, u)
        e1 = jax.tree.map(lambda s, p: 0.999 * s + 0.001 * p, e1, p1)
        p2, o2, e2 = fused_adamw_ema(g, o2, p2, e2, schedule=sched, cfg=cfg)
    for x, y in zip(jax.tree.leaves((p1, e1)), jax.tree.leaves((p2, e2))):
        np.testing.assert_allclose(x, y, rtol=2e-4, atol=2e-6)
    # identical opt_state structure + lockstep counts, so checkpoints from
    # either path resume under the other
    assert jax.tree.structure(o1) == jax.tree.structure(o2)
    for x, y in zip(jax.tree.leaves(o1), jax.tree.leaves(o2)):
        np.testing.assert_allclose(x, y, rtol=2e-4, atol=1e-6)


def test_fused_no_ema():
    cfg = _ns_cfg(gradient_clip_val=0.0)
    sched = lambda c: jnp.asarray(1e-3, jnp.float32)
    params = {"w": jnp.ones((4, 4), jnp.float32)}
    tx = optax.chain(
        optax.identity(), optax.adamw(sched, weight_decay=0.05)
    )
    opt = tx.init(params)
    g = {"w": jnp.full((4, 4), 0.5, jnp.float32)}
    u, o1 = tx.update(g, opt, params)
    p1 = optax.apply_updates(params, u)
    p2, o2, e2 = fused_adamw_ema(g, opt, params, None, schedule=sched, cfg=cfg)
    assert e2 is None
    np.testing.assert_allclose(p1["w"], p2["w"], rtol=1e-6)


def test_can_fuse_gating():
    class Tx:
        schedule = lambda c: 0.1
    assert can_fuse(_ns_cfg(), Tx())
    assert not can_fuse(_ns_cfg(schedule="plateau"), Tx())
    assert not can_fuse(_ns_cfg(freeze_stages=1), Tx())
    assert not can_fuse(_ns_cfg(fused_update=False), Tx())

    class NoSched:
        schedule = None
    assert not can_fuse(_ns_cfg(), NoSched())


@pytest.mark.parametrize("accum", [1, 2])
def test_train_step_fused_vs_generic(accum):
    """The full jitted train step must produce the same trajectory with
    fused_update on and off (tiny model, real aug+mix path)."""
    states = {}
    for fused in (False, True):
        cfg = Config(
            model_name="convnext_atto", num_classes=5,
            native_size=(24, 32), image_size=(32, 32), batch_size=8,
            gradient_accumulation_steps=accum, use_deep_supervision=False,
            use_ema=True, compute_dtype="float32", fused_update=fused,
            drop_path_rate=0.0,
        ).validate()
        bundle = create_model(cfg)
        schedule = build_lr_schedule(cfg, steps_per_epoch=10)
        tx = build_optimizer(cfg, schedule)
        variables = bundle.init(jax.random.key(0))
        state = create_train_state(variables, tx, use_ema=True)
        step = jax.jit(make_train_step(bundle, cfg, tx, build_criterion(cfg)))
        rng = np.random.default_rng(1)
        batch = {
            "image": jnp.asarray(
                rng.integers(0, 256, size=(8, 24, 32, 3)), jnp.uint8
            ),
            "label": jnp.asarray(rng.integers(0, 5, size=8), jnp.int32),
        }
        key = jax.random.key(7)
        for _ in range(6):
            state, metrics = step(state, batch, key)
        states[fused] = (state, float(metrics["loss"]))
    s0, l0 = states[False]
    s1, l1 = states[True]
    assert abs(l0 - l1) < 1e-4
    for a, b in zip(jax.tree.leaves(s0.params), jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=1e-5)
    for a, b in zip(
        jax.tree.leaves(s0.ema_params), jax.tree.leaves(s1.ema_params)
    ):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=1e-5)
    assert jax.tree.structure(s0.opt_state) == jax.tree.structure(s1.opt_state)


def test_pallas_gelu_matches_xla_fwd_bwd(monkeypatch):
    """gelu_erf_free_pallas (single-custom-call kernel) vs the XLA-fused
    gelu_erf_free: same values and gradients (interpret mode on CPU)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from image_classification_tpu.ops import gelu as G

    monkeypatch.setenv("IC_TPU_GELU_INTERPRET", "1")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-4, 4, size=(2, 3, 384)).astype(np.float32))

    y_ref = G.gelu_erf_free(x)
    y_pal = G.gelu_erf_free_pallas(x)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref), atol=1e-7)

    def loss_ref(v):
        return jnp.sum(jnp.sin(G.gelu_erf_free(v)))

    def loss_pal(v):
        return jnp.sum(jnp.sin(G.gelu_erf_free_pallas(v)))

    g_ref = jax.grad(loss_ref)(x)
    g_pal = jax.grad(loss_pal)(x)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref), atol=1e-6)

    # bf16 in/out, odd row count (partial tiles)
    xb = jnp.asarray(rng.uniform(-3, 3, size=(37, 256))).astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(G.gelu_erf_free_pallas(xb), dtype=np.float32),
        np.asarray(G.gelu_erf_free(xb), dtype=np.float32), atol=1e-2)

    # dispatch: non-tiling last dim falls back to the XLA path
    small = jnp.ones((4, 100), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(G.gelu_dispatch(small, impl="pallas")),
        np.asarray(G.gelu_erf_free(small)))
