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


def _full_aug_cfg(**kw):
    """Every augmentation stage forced ON (probability 1.0) — guards the
    class of SPMD miscompile already found once in this repo (vmapped
    strided conv, models/convnext.py:165-176): the geometry warp's
    dot_generals, distortion maps, blur convs, color/HSV selects, randaug,
    erase, and the cross-sample mixup/cutmix gather all under a sharded
    batch dim."""
    base = dict(
        model_name="convnext_femto",
        num_classes=8,
        native_size=(24, 32),
        image_size=(32, 32),
        batch_size=8,
        gradient_accumulation_steps=1,
        use_deep_supervision=False,
        use_ema=False,
        compute_dtype="float32",
        hflip_prob=1.0, vflip_prob=1.0, ssr_prob=1.0,
        noise_blur_prob=1.0, distortion_prob=1.0,
        color_jitter_prob=1.0, color_shift_prob=1.0,
        random_erasing_prob=1.0,
        use_randaugment=True, randaugment_prob=1.0,
        mixup_alpha=0.2, cutmix_alpha=1.0, mix_prob=1.0,
    )
    base.update(kw)
    return Config(**base).validate()


def test_full_aug_chain_dp_matches_single_device():
    """The FULL augmentation chain (every stage p=1.0) must produce the same
    images dp-sharded as on one device, and a train step with in-batch
    mixup/cutmix (a cross-shard gather) must match too."""
    from image_classification_tpu.aug.pipeline import aug_configs_from, train_augment
    from image_classification_tpu.parallel.mesh import batch_sharding

    cfg = _full_aug_cfg()
    mesh = build_mesh(MeshSpec(data=8, model=1))
    aug = aug_configs_from(cfg)
    rng = np.random.default_rng(7)
    images_np = rng.integers(0, 256, (cfg.batch_size, *cfg.native_size, 3)).astype(
        np.uint8
    )
    key = jax.random.key(11)

    run = jax.jit(lambda imgs: train_augment(imgs, key, aug))
    plain = np.asarray(run(images_np), np.float32)

    b_shard = batch_sharding(mesh)
    sharded_in = jax.device_put(images_np, b_shard)
    sharded = np.asarray(run(sharded_in), np.float32)
    np.testing.assert_allclose(plain, sharded, atol=2e-3, rtol=1e-3)

    # full train step (adds the in-batch mix's cross-shard permutation
    # gather and the model under dp sharding)
    bundle = create_model(cfg)
    tx = build_optimizer(cfg, cfg.lr)
    state = create_train_state(bundle.init(jax.random.key(0)), tx, use_ema=False)
    step_plain = jax.jit(make_train_step(bundle, cfg, tx, build_criterion(cfg)))
    batch_np = {
        "image": images_np,
        "label": rng.integers(0, 8, cfg.batch_size).astype(np.int32),
    }
    s1, m1 = step_plain(state, batch_np, jax.random.key(2))

    s_shard = state_shardings(state, mesh)
    step_sh = jax.jit(
        make_train_step(bundle, cfg, tx, build_criterion(cfg)),
        out_shardings=(s_shard, None),
    )
    batch_sh = {k: jax.device_put(v, b_shard) for k, v in batch_np.items()}
    s2, m2 = step_sh(jax.device_put(state, s_shard), batch_sh, jax.random.key(2))
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-4)
    a = np.asarray(s1.params["stage0_block0"]["mlp_fc1"]["kernel"])
    b = np.asarray(s2.params["stage0_block0"]["mlp_fc1"]["kernel"])
    np.testing.assert_allclose(a, b, atol=1e-5)


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


def test_pallas_block_mlp_shard_map_dp(monkeypatch):
    """dp-only mesh keeps block_mlp_impl=pallas via shard_map (rows sharded
    on "data", weights replicated; weight-grad psum from shard_map's
    transpose rule). The sharded step must match the unsharded kernel step
    exactly — interpret mode stands in for the TPU kernel on CPU."""
    monkeypatch.setenv("IC_TPU_BLOCKMLP_INTERPRET", "1")
    mesh = build_mesh(MeshSpec(data=8, model=1))
    cfg = Config(
        model_name="convnext_femto",
        num_classes=8,
        native_size=(24, 32),
        image_size=(32, 32),
        batch_size=8,
        gradient_accumulation_steps=1,
        use_deep_supervision=False,
        use_ema=False,
        compute_dtype="float32",
        block_mlp_impl="pallas",
        distortion_prob=0.0,
        noise_blur_prob=0.0,
        color_jitter_prob=0.0,
        color_shift_prob=0.0,
    ).validate()
    bundle_sh = create_model(cfg, mesh=mesh)
    assert bundle_sh.module.shard_mesh is mesh
    assert bundle_sh.module.block_mlp_impl == "pallas"
    # no mesh on an 8-device backend -> demoted to the XLA formulation,
    # so this compares the shard_map'd interpret-mode kernel against the
    # XLA math end-to-end (through loss, grads, and the optimizer update)
    bundle_1 = create_model(cfg)
    assert bundle_1.module.block_mlp_impl == "xla"
    tx = build_optimizer(cfg, cfg.lr)
    # init the SHARDED bundle: batch-1 init on the default device is
    # incompatible with a shard_map'd module — regression for the
    # init_module twin (factory.ModelBundle.init)
    variables = bundle_sh.init(jax.random.key(0))
    state = create_train_state(variables, tx, use_ema=False)
    rng = np.random.default_rng(3)
    batch_np = {
        "image": rng.integers(0, 256, (cfg.batch_size, *cfg.native_size, 3)).astype(
            np.uint8
        ),
        "label": rng.integers(0, 8, cfg.batch_size).astype(np.int32),
    }
    step_plain = jax.jit(make_train_step(bundle_1, cfg, tx, build_criterion(cfg)))
    s1, m1 = step_plain(state, batch_np, jax.random.key(2))

    s_shard = state_shardings(state, mesh)
    state_sh = jax.device_put(state, s_shard)
    b_shard = batch_sharding(mesh)
    batch_sh = {k: jax.device_put(v, b_shard) for k, v in batch_np.items()}
    step_sh = jax.jit(
        make_train_step(bundle_sh, cfg, tx, build_criterion(cfg)),
        out_shardings=(s_shard, None),
    )
    s2, m2 = step_sh(state_sh, batch_sh, jax.random.key(2))
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-5)
    a = np.asarray(s1.params["stage0_block0"]["mlp_fc1"]["kernel"])
    b = np.asarray(s2.params["stage0_block0"]["mlp_fc1"]["kernel"])
    np.testing.assert_allclose(a, b, atol=1e-5)
