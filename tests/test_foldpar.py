"""Fold-parallel training (train/foldpar.py): sharding specs + end-to-end
equivalence with the sequential K-fold path on a (fold=2, data=2, model=2)
virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_classification_tpu.core.config import Config
from image_classification_tpu.data import make_synthetic_dataset
from image_classification_tpu.parallel.mesh import (
    FOLD_AXIS,
    MeshSpec,
    build_mesh,
)
from image_classification_tpu.parallel.shardings import fold_state_shardings


def _cfg(root, **kw):
    base = dict(
        train_dir=f"{root}/data/train",
        test_dir=f"{root}/data/test",
        train_csv=f"{root}/data/train.csv",
        test_csv=f"{root}/data/sample_submission.csv",
        submission_path=f"{root}/submission.csv",
        model_save_path=f"{root}/models",
        output_dir=f"{root}/out",
        num_classes=6,
        native_size=(24, 32),
        image_size=(32, 32),
        model_name="convnext_atto",
        use_deep_supervision=False,
        batch_size=8,
        epochs=2,
        num_folds=2,
        compute_dtype="float32",
        use_decode_cache=False,
        patience=100,
        # keep the graph small/fast; aug still exercises the fused pipeline
        distortion_prob=0.0,
        noise_blur_prob=0.0,
        random_erasing_prob=0.0,
    )
    base.update(kw)
    return Config(**base).validate()


def test_mesh_spec_fold_axis():
    fold, data, model = MeshSpec(data=-1, model=2, fold=2).resolve(8)
    assert (fold, data, model) == (2, 2, 2)
    with pytest.raises(ValueError):
        MeshSpec(data=3, model=1, fold=2).resolve(8)


def test_fold_state_shardings_specs():
    mesh = build_mesh(MeshSpec(data=2, model=2, fold=2))
    assert mesh.shape[FOLD_AXIS] == 2
    from jax.sharding import PartitionSpec as P

    stacked = {
        "mlp_fc1": {"kernel": jnp.zeros((2, 8, 16)), "bias": jnp.zeros((2, 16))},
        "other": {"kernel": jnp.zeros((2, 8, 8))},
        "step": jnp.zeros((2,), jnp.int32),
    }
    sh = fold_state_shardings(stacked, mesh)
    assert sh["mlp_fc1"]["kernel"].spec == P(FOLD_AXIS, None, "model")
    assert sh["mlp_fc1"]["bias"].spec == P(FOLD_AXIS, "model")
    assert sh["other"]["kernel"].spec == P(FOLD_AXIS)
    assert sh["step"].spec == P(FOLD_AXIS)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("foldpar"))
    make_synthetic_dataset(
        f"{root}/data", n_train=96, n_test=8, num_classes=6,
        native_size=(24, 32), seed=3,
    )
    return root


def test_fold_parallel_matches_sequential(dataset):
    """Same folds, same seeds: fold-parallel must reproduce the sequential
    per-fold trajectories (identical inputs, keys, and math; tolerance for
    vmap/sharding reassociation)."""
    from image_classification_tpu.train.kfold import train_k_fold

    root = dataset
    seq_cfg = _cfg(root, output_dir=f"{root}/out_seq",
                   model_save_path=f"{root}/models_seq")
    seq = train_k_fold(seq_cfg)

    par_cfg = _cfg(root, fold_parallel=True, output_dir=f"{root}/out_par",
                   model_save_path=f"{root}/models_par")
    mesh = build_mesh(MeshSpec(data=2, model=2, fold=2))
    par = train_k_fold(par_cfg, mesh=mesh)

    assert len(seq) == len(par) == 2
    for s, p in zip(seq, par):
        assert s.fold == p.fold
        assert len(s.history) == len(p.history)
        for hs, hp in zip(s.history, p.history):
            np.testing.assert_allclose(
                hs["train_loss"], hp["train_loss"], rtol=0.02, atol=0.02
            )
            np.testing.assert_allclose(
                hs["val_acc"], hp["val_acc"], rtol=0, atol=0.021
            )
        # the saved best params must be per-fold distinct
    a = jax.tree.leaves(par[0].best_variables["params"])[0]
    b = jax.tree.leaves(par[1].best_variables["params"])[0]
    assert not np.allclose(a, b)


def test_fold_parallel_weighted_loss_matches_sequential(dataset):
    """use_weighted_loss: each fold's class weights must come from ITS OWN
    train-split counts (threaded through vmap as a (K, num_classes) operand),
    reproducing the sequential per-fold trajectories."""
    from image_classification_tpu.train.kfold import train_k_fold

    root = dataset
    kw = dict(use_weighted_loss=True, epochs=1)
    seq = train_k_fold(_cfg(root, output_dir=f"{root}/out_wseq",
                            model_save_path=f"{root}/models_wseq", **kw))
    mesh = build_mesh(MeshSpec(data=2, model=2, fold=2))
    par = train_k_fold(
        _cfg(root, fold_parallel=True, output_dir=f"{root}/out_wpar",
             model_save_path=f"{root}/models_wpar", **kw),
        mesh=mesh,
    )
    for s, p in zip(seq, par):
        for hs, hp in zip(s.history, p.history):
            np.testing.assert_allclose(
                hs["train_loss"], hp["train_loss"], rtol=0.02, atol=0.02
            )
            np.testing.assert_allclose(
                hs["val_acc"], hp["val_acc"], rtol=0, atol=0.021
            )


def test_fold_parallel_resume_exact_continuation(dataset):
    """2 epochs + resume + 2 must reproduce a straight 4-epoch fold-parallel
    run exactly (stacked TrainState + per-fold host bookkeeping are
    checkpointed to ``train_state_foldpar``)."""
    from image_classification_tpu.train.kfold import train_k_fold

    root = dataset
    mesh = build_mesh(MeshSpec(data=2, model=2, fold=2))

    # schedule="none": the warmup-cosine horizon is sized by cfg.epochs, so a
    # 2-epoch first leg would train under a different LR curve than the
    # straight 4-epoch run — constant LR isolates the resume machinery.
    straight_cfg = _cfg(
        root, fold_parallel=True, epochs=4, schedule="none",
        output_dir=f"{root}/out_straight", model_save_path=f"{root}/models_straight",
    )
    straight = train_k_fold(straight_cfg, mesh=mesh)

    cfg1 = _cfg(
        root, fold_parallel=True, epochs=2, schedule="none",
        output_dir=f"{root}/out_res", model_save_path=f"{root}/models_res",
    )
    train_k_fold(cfg1, mesh=mesh)
    import os

    assert os.path.exists(os.path.join(cfg1.output_dir, "train_state_foldpar"))
    cfg2 = cfg1.replace(epochs=4)
    resumed = train_k_fold(cfg2, mesh=mesh, resume=True)

    for s, r in zip(straight, resumed):
        assert [h["epoch"] for h in r.history] == [2, 3]
        tail = s.history[2:]
        for a, b in zip(tail, r.history):
            for key in ("train_loss", "train_acc", "val_loss", "val_acc"):
                assert a[key] == pytest.approx(b[key], rel=1e-5, abs=1e-6), (
                    f"fold {s.fold} epoch {a['epoch']} {key}"
                )
        assert r.best_val_acc == pytest.approx(s.best_val_acc, abs=1e-6)


def test_fold_parallel_plateau_matches_sequential(dataset):
    """schedule='plateau': K host-side PlateauSchedulers step on each fold's
    own val metric and inject a (K,) LR vector into the stacked
    inject_hyperparams leaf — trajectories must match the sequential path
    (which injects a scalar per fold)."""
    from image_classification_tpu.train.kfold import train_k_fold

    root = dataset
    kw = dict(
        schedule="plateau", plateau_patience=0, plateau_factor=0.5, epochs=3
    )
    seq = train_k_fold(_cfg(root, output_dir=f"{root}/out_pseq",
                            model_save_path=f"{root}/models_pseq", **kw))
    mesh = build_mesh(MeshSpec(data=2, model=2, fold=2))
    par = train_k_fold(
        _cfg(root, fold_parallel=True, output_dir=f"{root}/out_ppar",
             model_save_path=f"{root}/models_ppar", **kw),
        mesh=mesh,
    )
    for s, p in zip(seq, par):
        assert len(s.history) == len(p.history) == 3
        for hs, hp in zip(s.history, p.history):
            np.testing.assert_allclose(
                hs["train_loss"], hp["train_loss"], rtol=0.02, atol=0.02
            )
            np.testing.assert_allclose(
                hs["val_acc"], hp["val_acc"], rtol=0, atol=0.021
            )


def test_fold_parallel_plateau_injection_is_per_fold(dataset):
    """The (K,) LR vector written by set_learning_rate must act per fold
    under the vmapped step: LR 0 freezes fold 0's params while fold 1
    (LR > 0) moves."""
    import numpy as np

    from image_classification_tpu.models.factory import create_model
    from image_classification_tpu.parallel.mesh import fold_batch_sharding
    from image_classification_tpu.train.foldpar import init_fold_states
    from image_classification_tpu.train.loss import build_criterion
    from image_classification_tpu.train.optim import (
        build_optimizer,
        set_learning_rate,
    )
    from image_classification_tpu.train.step import make_train_step
    from image_classification_tpu.train.train_state import create_train_state

    root = dataset
    cfg = _cfg(root, schedule="plateau", use_ema=False)
    mesh = build_mesh(MeshSpec(data=2, model=2, fold=2))
    bundle = create_model(cfg)
    tx = build_optimizer(cfg, cfg.lr)
    stacked_vars = init_fold_states(cfg, bundle, mesh, 2)
    state = jax.vmap(lambda v: create_train_state(v, tx, use_ema=False))(
        jax.tree.map(jnp.asarray, stacked_vars)
    )
    s_shard = fold_state_shardings(state, mesh)
    state = jax.device_put(state, s_shard)
    state = state.replace(
        opt_state=set_learning_rate(
            state.opt_state, np.asarray([0.0, cfg.lr], np.float32)
        )
    )
    state = jax.device_put(state, s_shard)

    step = jax.jit(
        jax.vmap(make_train_step(bundle, cfg, tx, build_criterion(cfg))),
        out_shardings=(s_shard, None),
    )
    rng = np.random.default_rng(0)
    b_shard = fold_batch_sharding(mesh)
    batch = {
        "image": jax.device_put(
            rng.integers(
                0, 256, size=(2, cfg.batch_size, *cfg.native_size, 3)
            ).astype(np.uint8),
            b_shard,
        ),
        "label": jax.device_put(
            rng.integers(0, cfg.num_classes, size=(2, cfg.batch_size)).astype(
                np.int32
            ),
            b_shard,
        ),
    }
    keys = jnp.stack([jax.random.key(1), jax.random.key(2)])
    before = jax.tree.map(np.asarray, state.params)
    new_state, _ = step(state, batch, keys)
    after = jax.tree.map(np.asarray, new_state.params)
    leaf_b = jax.tree.leaves(before)[0]
    leaf_a = jax.tree.leaves(after)[0]
    np.testing.assert_array_equal(leaf_a[0], leaf_b[0])  # fold 0: lr 0
    assert not np.allclose(leaf_a[1], leaf_b[1])  # fold 1: lr > 0


def test_fold_parallel_progressive_matches_sequential(dataset):
    """progressive_resizing: the per-stage input size is epoch-dependent but
    fold-independent, so the stacked path caches one vmapped step per size
    (like the sequential step cache) and must reproduce its trajectories."""
    from image_classification_tpu.train.kfold import train_k_fold

    root = dataset
    kw = dict(
        progressive_resizing=True, progressive_scales=(0.5, 1.0), epochs=2
    )
    seq = train_k_fold(_cfg(root, output_dir=f"{root}/out_gseq",
                            model_save_path=f"{root}/models_gseq", **kw))
    mesh = build_mesh(MeshSpec(data=2, model=2, fold=2))
    par = train_k_fold(
        _cfg(root, fold_parallel=True, output_dir=f"{root}/out_gpar",
             model_save_path=f"{root}/models_gpar", **kw),
        mesh=mesh,
    )
    for s, p in zip(seq, par):
        assert len(s.history) == len(p.history) == 2
        for hs, hp in zip(s.history, p.history):
            np.testing.assert_allclose(
                hs["train_loss"], hp["train_loss"], rtol=0.02, atol=0.02
            )
            np.testing.assert_allclose(
                hs["val_acc"], hp["val_acc"], rtol=0, atol=0.021
            )


def test_fold_parallel_swa_matches_sequential(dataset):
    """use_swa: the stacked SWA average, BN-free finalization validation, and
    per-fold best replacement must reproduce the sequential path's SWA
    results (same snapshots, same selection decision)."""
    from image_classification_tpu.train.kfold import train_k_fold

    root = dataset
    kw = dict(use_swa=True, swa_start_epoch=1, epochs=3)
    seq = train_k_fold(_cfg(root, output_dir=f"{root}/out_sseq",
                            model_save_path=f"{root}/models_sseq", **kw))
    mesh = build_mesh(MeshSpec(data=2, model=2, fold=2))
    par = train_k_fold(
        _cfg(root, fold_parallel=True, output_dir=f"{root}/out_spar",
             model_save_path=f"{root}/models_spar", **kw),
        mesh=mesh,
    )
    for s, p in zip(seq, par):
        for hs, hp in zip(s.history, p.history):
            np.testing.assert_allclose(
                hs["train_loss"], hp["train_loss"], rtol=0.02, atol=0.02
            )
        # SWA may or may not win over the epoch best, but both paths must
        # agree on the resulting best accuracy
        np.testing.assert_allclose(s.best_val_acc, p.best_val_acc, atol=0.021)


def test_fold_parallel_swa_bn_refresh(dataset):
    """A BatchNorm model (EfficientNet) exercises the stacked BN-refresh
    pass: the run must complete with finite metrics and per-fold-distinct
    best params."""
    from image_classification_tpu.train.kfold import train_k_fold

    root = dataset
    cfg = _cfg(
        root, fold_parallel=True, model_name="efficientnet_b0",
        use_swa=True, swa_start_epoch=1, epochs=2,
        output_dir=f"{root}/out_bnswa", model_save_path=f"{root}/models_bnswa",
    )
    mesh = build_mesh(MeshSpec(data=2, model=2, fold=2))
    par = train_k_fold(cfg, mesh=mesh)
    assert len(par) == 2
    for p in par:
        assert np.isfinite(p.history[-1]["train_loss"])
        assert "batch_stats" in p.best_variables


def test_fold_parallel_selects_matmul_downsample():
    """Stacked fold programs must lower downsamples as space-to-depth
    matmuls: jax's vmap batching rule for strided convs merges the fold
    axis into batch via reshape, which GSPMD on a (fold, data, model) mesh
    can only re-shard by involuntary full rematerialization (seen at
    downsample{1,2}_conv/reshape in the r4 dryrun). dot_general vmaps
    through native batch dims, so the matmul form avoids the copy."""
    from image_classification_tpu.core.config import Config
    from image_classification_tpu.models.factory import create_model

    base = dict(model_name="convnext_atto", num_classes=8,
                use_deep_supervision=True)
    stacked = create_model(Config(**base, fold_parallel=True).validate())
    assert stacked.module.backbone.downsample_impl == "matmul"
    seq = create_model(Config(**base, fold_parallel=False).validate())
    assert seq.module.backbone.downsample_impl == "conv"
    # an explicit matmul request is honored in both modes
    explicit = create_model(
        Config(**base, fold_parallel=False, downsample_impl="matmul").validate()
    )
    assert explicit.module.backbone.downsample_impl == "matmul"
