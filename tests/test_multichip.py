"""Multi-chip SPMD: full train step over a dp x tp mesh on the 8-device
virtual CPU platform (the standard stand-in for real slices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_classification_tpu.core.config import Config
from image_classification_tpu.models.factory import create_model
from image_classification_tpu.parallel.mesh import MeshSpec, batch_sharding, build_mesh
from image_classification_tpu.parallel.shardings import param_shardings, state_shardings
from image_classification_tpu.train.loss import build_criterion
from image_classification_tpu.train.optim import build_optimizer
from image_classification_tpu.train.step import make_train_step
from image_classification_tpu.train.train_state import create_train_state


@pytest.fixture(scope="module")
def dp_tp_setup():
    mesh = build_mesh(MeshSpec(data=4, model=2))
    cfg = Config(
        model_name="convnext_femto",
        num_classes=8,
        native_size=(24, 32),
        image_size=(32, 32),
        batch_size=8,
        gradient_accumulation_steps=2,
        use_deep_supervision=False,
        use_ema=True,
        compute_dtype="float32",
        distortion_prob=0.0,
        noise_blur_prob=0.0,
        color_jitter_prob=0.0,
        color_shift_prob=0.0,
    ).validate()
    bundle = create_model(cfg)
    tx = build_optimizer(cfg, cfg.lr)
    variables = bundle.init(jax.random.key(0))
    state = create_train_state(variables, tx, use_ema=True)
    return mesh, cfg, bundle, tx, state


def test_param_shardings_tp(dp_tp_setup):
    mesh, cfg, bundle, tx, state = dp_tp_setup
    shards = param_shardings(state.params, mesh)
    fc1 = shards["stage0_block0"]["mlp_fc1"]["kernel"]
    assert fc1.spec == jax.sharding.PartitionSpec(None, "model")
    fc2 = shards["stage0_block0"]["mlp_fc2"]["kernel"]
    assert fc2.spec == jax.sharding.PartitionSpec("model", None)
    # conv kernels replicate
    dw = shards["stage0_block0"]["conv_dw"]["kernel"]
    assert dw.spec == jax.sharding.PartitionSpec()


def test_full_step_dp_tp(dp_tp_setup):
    mesh, cfg, bundle, tx, state = dp_tp_setup
    s_shard = state_shardings(state, mesh)
    state = jax.device_put(state, s_shard)
    rng = np.random.default_rng(0)
    b_shard = batch_sharding(mesh)
    batch = {
        "image": jax.device_put(
            rng.integers(0, 256, (cfg.batch_size, *cfg.native_size, 3)).astype(
                np.uint8
            ),
            b_shard,
        ),
        "label": jax.device_put(
            rng.integers(0, 8, cfg.batch_size).astype(np.int32), b_shard
        ),
    }
    step = jax.jit(
        make_train_step(bundle, cfg, tx, build_criterion(cfg)),
        out_shardings=(s_shard, None),
    )
    new_state, metrics = step(state, batch, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))
    # fc1 kernel stayed sharded over the model axis
    fc1 = new_state.params["stage0_block0"]["mlp_fc1"]["kernel"]
    assert fc1.sharding.spec == jax.sharding.PartitionSpec(None, "model")


def test_dp_matches_single_device(dp_tp_setup):
    """The sharded step must compute the same update as an unsharded one."""
    mesh, cfg, bundle, tx, state = dp_tp_setup
    rng = np.random.default_rng(1)
    batch_np = {
        "image": rng.integers(0, 256, (cfg.batch_size, *cfg.native_size, 3)).astype(
            np.uint8
        ),
        "label": rng.integers(0, 8, cfg.batch_size).astype(np.int32),
    }
    step_plain = jax.jit(make_train_step(bundle, cfg, tx, build_criterion(cfg)))
    s1, m1 = step_plain(state, batch_np, jax.random.key(2))

    s_shard = state_shardings(state, mesh)
    state_sh = jax.device_put(state, s_shard)
    b_shard = batch_sharding(mesh)
    batch_sh = {k: jax.device_put(v, b_shard) for k, v in batch_np.items()}
    step_sh = jax.jit(
        make_train_step(bundle, cfg, tx, build_criterion(cfg)),
        out_shardings=(s_shard, None),
    )
    s2, m2 = step_sh(state_sh, batch_sh, jax.random.key(2))
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-5)
    a = np.asarray(s1.params["stage0_block0"]["mlp_fc1"]["kernel"])
    b = np.asarray(s2.params["stage0_block0"]["mlp_fc1"]["kernel"])
    np.testing.assert_allclose(a, b, atol=1e-5)
