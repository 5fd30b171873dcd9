"""Subprocess worker for tests/test_multihost_live.py (not a test module).

Each process: env-driven ``initialize()`` (the package's own multi-host
wiring), a global mesh spanning both processes' virtual CPU devices,
per-host loader sharding (each host decodes only its slice of every global
batch), ``host_local_batch_to_global`` assembly, and a few real train
steps. Writes the per-step losses as JSON so the parent can compare
against a single-process run of the identical program.
"""

import json
import os
import sys


def main() -> None:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    data_root = sys.argv[4]
    out_path = sys.argv[5]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    # the generic launcher contract initialize() detects
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
    os.environ["JAX_NUM_PROCESSES"] = str(nproc)
    os.environ["JAX_PROCESS_ID"] = str(pid)

    import jax

    jax.config.update("jax_platforms", "cpu")

    from image_classification_tpu.parallel.distributed import initialize

    initialize()
    assert jax.distributed.is_initialized()
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == 2

    losses = run_training(data_root, n_steps=3)
    foldpar_losses = run_training_foldpar(n_steps=3)
    if pid == 0:
        with open(out_path, "w") as f:
            json.dump({"losses": losses, "foldpar_losses": foldpar_losses,
                       "device_count": jax.device_count()}, f)


def run_training(data_root: str, n_steps: int) -> list:
    """The shared program: identical whether run under 1 process (4 local
    devices) or 2 processes (2 local devices each)."""
    import numpy as np

    import jax

    from image_classification_tpu.core.config import Config
    from image_classification_tpu.data import DataLoader, Manifest
    from image_classification_tpu.data.sampling import SequentialSampler
    from image_classification_tpu.data.source import ImageSource
    from image_classification_tpu.models.factory import create_model
    from image_classification_tpu.parallel.mesh import MeshSpec, build_mesh
    from image_classification_tpu.parallel.shardings import state_shardings
    from image_classification_tpu.train.loss import build_criterion
    from image_classification_tpu.train.optim import build_optimizer
    from image_classification_tpu.train.step import make_train_step
    from image_classification_tpu.train.train_state import create_train_state

    cfg = Config(
        model_name="convnext_atto",
        num_classes=6,
        native_size=(24, 32),
        image_size=(32, 32),
        batch_size=8,
        gradient_accumulation_steps=1,
        use_deep_supervision=False,
        use_ema=True,
        compute_dtype="float32",
        use_decode_cache=False,
    ).validate()

    mesh = build_mesh(MeshSpec(data=4, model=1), devices=jax.devices()[:4])

    manifest = Manifest.from_csv(
        os.path.join(data_root, "train.csv"), num_classes=cfg.num_classes
    )
    source = ImageSource(
        os.path.join(data_root, "train"), manifest.ids,
        native_size=tuple(cfg.native_size), cache_dir=None,
    )
    loader = DataLoader(
        source, manifest,
        batch_size=cfg.batch_size,
        sampler=SequentialSampler(len(manifest)),
        drop_last=True, pad_last=False,
        mesh=mesh,
        prefetch_depth=0,
    )

    bundle = create_model(cfg)
    tx = build_optimizer(cfg, cfg.lr)
    variables = bundle.init(jax.random.key(0))
    state = create_train_state(variables, tx, use_ema=cfg.use_ema)
    s_shard = state_shardings(state, mesh)
    state = jax.device_put(state, s_shard)
    step = jax.jit(
        make_train_step(bundle, cfg, tx, build_criterion(cfg)),
        out_shardings=(s_shard, None),
    )

    losses = []
    it = iter(loader)
    for i in range(n_steps):
        batch = next(it)
        state, metrics = step(
            state, {k: batch[k] for k in ("image", "label")}, jax.random.key(i)
        )
        losses.append(float(metrics["loss"]))
    return losses


def run_training_foldpar(n_steps: int) -> list:
    """Phase 2: the fold-parallel mesh (fold=2 x data=2) — the same stacked
    SPMD program as `__graft_entry__._dryrun_fold_parallel`, here spanning
    2 OS processes x 2 local devices. Batches are seeded numpy (identical
    on every host); arrays enter the multi-process mesh via
    ``jax.make_array_from_callback`` so each host materializes only its
    addressable shards. Identical under 1 process (4 local devices)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from image_classification_tpu.core import prng
    from image_classification_tpu.core.config import Config
    from image_classification_tpu.models.factory import create_model
    from image_classification_tpu.parallel.mesh import (
        MeshSpec,
        build_mesh,
        fold_batch_sharding,
    )
    from image_classification_tpu.parallel.shardings import fold_state_shardings
    from image_classification_tpu.train.foldpar import init_fold_states
    from image_classification_tpu.train.loss import build_criterion
    from image_classification_tpu.train.optim import build_optimizer
    from image_classification_tpu.train.step import make_train_step
    from image_classification_tpu.train.train_state import create_train_state

    n_folds = 2
    cfg = Config(
        model_name="convnext_atto",
        num_classes=6,
        native_size=(24, 32),
        image_size=(32, 32),
        batch_size=4,
        gradient_accumulation_steps=1,
        use_deep_supervision=False,
        use_ema=True,
        compute_dtype="float32",
        fold_parallel=True,
    ).validate()
    mesh = build_mesh(
        MeshSpec(fold=n_folds, data=2, model=1), devices=jax.devices()[:4]
    )

    def to_mesh(tree, shardings):
        return jax.tree.map(
            lambda x, s: jax.make_array_from_callback(
                np.shape(x), s, lambda idx, _x=x: np.asarray(_x)[idx]
            ),
            tree, shardings,
        )

    bundle = create_model(cfg)
    tx = build_optimizer(cfg, cfg.lr)
    stacked_vars = init_fold_states(cfg, bundle, mesh, n_folds)
    state = jax.vmap(lambda v: create_train_state(v, tx, use_ema=True))(
        jax.tree.map(jnp.asarray, stacked_vars)
    )
    s_shard = fold_state_shardings(state, mesh)
    state = to_mesh(jax.tree.map(np.asarray, state), s_shard)
    b_shard = fold_batch_sharding(mesh)

    root = prng.root_key(cfg.seed)
    step_keys = jnp.stack(
        [prng.fold_name(prng.fold(root, k), "steps")
         for k in range(1, n_folds + 1)]
    )
    # metrics come back fully REPLICATED: the vmapped per-fold loss vector
    # is otherwise sharded over the fold axis, which spans processes — a
    # process-local fetch of it would raise (non-addressable shards)
    rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    step = jax.jit(
        jax.vmap(make_train_step(bundle, cfg, tx, build_criterion(cfg))),
        out_shardings=(s_shard, rep),
    )

    rng = np.random.default_rng(7)
    losses = []
    for i in range(n_steps):
        batch = {
            "image": rng.integers(
                0, 256, size=(n_folds, cfg.batch_size, *cfg.native_size, 3)
            ).astype(np.uint8),
            "label": rng.integers(
                0, cfg.num_classes, size=(n_folds, cfg.batch_size)
            ).astype(np.int32),
        }
        gbatch = to_mesh(batch, {k: b_shard for k in batch})
        state, metrics = step(state, gbatch, step_keys)
        losses.append(np.asarray(metrics["loss"]).reshape(-1).tolist())
    return losses


if __name__ == "__main__":
    main()
