"""Command-line entry points.

The reference had none (behavior was changed by editing config.py,
SURVEY.md §5.6); here one CLI drives the whole framework:

    python -m image_classification_tpu.cli train   [--config cfg.json] [k=v ...]
    python -m image_classification_tpu.cli predict [--config cfg.json] [k=v ...]
    python -m image_classification_tpu.cli bench   [k=v ...]

``train`` mirrors `train_advanced_v4.py:main()` (`:657-719`): K-fold train,
then ensemble-predict the test set and write the submission CSV.
``predict`` mirrors `testdata.py:108-177`: load best fold checkpoints and
write ``id,predict``.
"""

from __future__ import annotations

import argparse
import os
import sys


def _build_cfg(args):
    from image_classification_tpu.core.cache import enable_compilation_cache
    from image_classification_tpu.core.config import load_config

    enable_compilation_cache()
    return load_config(args.config, args.overrides)


def cmd_train(args) -> None:
    import jax

    from image_classification_tpu.data import DataLoader, Manifest
    from image_classification_tpu.data.loader import device_cache_wanted
    from image_classification_tpu.data.sampling import SequentialSampler
    from image_classification_tpu.infer import predict_ensemble, write_submission
    from image_classification_tpu.parallel import MeshSpec, build_mesh
    from image_classification_tpu.train.kfold import (
        build_source,
        train_ensemble,
        train_k_fold,
    )
    from image_classification_tpu.utils.logging import setup_logging

    cfg = _build_cfg(args)
    logger = setup_logging(os.path.join(cfg.output_dir, "train.log"))
    os.makedirs(cfg.model_save_path, exist_ok=True)
    os.makedirs(cfg.output_dir, exist_ok=True)
    from image_classification_tpu.parallel.distributed import initialize

    initialize()  # no-op on a single host
    mesh = build_mesh(MeshSpec(
        cfg.mesh_data, cfg.mesh_model,
        fold=cfg.num_folds if cfg.fold_parallel else 1,
    ))
    logger.info("devices: %s, mesh: %s", jax.devices(), dict(mesh.shape))
    if cfg.debug_nans:
        jax.config.update("jax_debug_nans", True)

    if cfg.ensemble_models:
        results, ens_weights = train_ensemble(cfg, mesh=mesh, resume=args.resume)
    else:
        results = train_k_fold(cfg, mesh=mesh, resume=args.resume)
        ens_weights = None
    if not results:
        logger.error("training produced no models")
        sys.exit(1)
    for r in results:
        logger.info("%s fold %d best val acc: %.4f",
                    r.bundle.name, r.fold, r.best_val_acc)

    # test-set ensemble prediction -> submission (train_advanced_v4.py:690-712)
    test_manifest = Manifest.from_csv(cfg.test_csv, is_test=True)
    test_source = build_source(cfg, test_manifest, cfg.test_dir)
    test_loader = DataLoader(
        test_source, test_manifest,
        batch_size=cfg.batch_size * cfg.infer_batch_multiplier,
        sampler=SequentialSampler(len(test_manifest)), pad_last=True,
        device_cache=device_cache_wanted(cfg, test_source),
    )
    ids, preds, _ = predict_ensemble(
        [r.bundle for r in results],
        [r.best_variables for r in results],
        test_loader, cfg,
        weights=ens_weights,
    )
    write_submission(ids, preds, cfg.submission_path, column="target")


def cmd_predict(args) -> None:
    from image_classification_tpu.data import DataLoader, Manifest
    from image_classification_tpu.data.loader import device_cache_wanted
    from image_classification_tpu.data.sampling import SequentialSampler
    from image_classification_tpu.infer import predict_ensemble, write_submission
    from image_classification_tpu.models.factory import create_model
    from image_classification_tpu.train.kfold import build_source
    from image_classification_tpu.utils import checkpoint as ckpt
    from image_classification_tpu.utils.logging import setup_logging

    cfg = _build_cfg(args)
    logger = setup_logging()
    if cfg.norm_stats == "dataset":
        # inference must normalize with the SAME train-set stats as training
        # (example.py:119-135). Preferred source: the norm_stats.json the
        # trainer wrote next to the checkpoints — standalone inference then
        # needs no training data at all. Fallback: recompute from the train
        # set (cached JSON keyed by the decode cache).
        from image_classification_tpu.data.stats import (
            load_saved_norm_stats,
            resolve_norm_stats,
        )

        resolved = load_saved_norm_stats(
            cfg, os.path.join(cfg.model_save_path, "norm_stats.json")
        )
        if resolved is not None:
            cfg = resolved
        else:
            train_manifest = Manifest.from_csv(
                cfg.train_csv, num_classes=cfg.num_classes
            )
            cfg = resolve_norm_stats(
                cfg, build_source(cfg, train_manifest, cfg.train_dir)
            )
    bundle = create_model(cfg)
    import jax

    variables = bundle.init(jax.random.key(0))
    folds = args.folds or [1]
    metric = getattr(args, "metric", "acc")
    if args.best_fold:
        # pick the single best checkpoint by the stored metric
        # (example.py:452-460; best-loss tier example.py:380-390)
        best, score = ckpt.select_best_fold(cfg.model_save_path, folds, metric)
        logger.info("best fold by stored val_%s: %d (%.4f)", metric, best, score)
        folds = [best]
    bundles, var_list = [], []
    for fold in folds:
        template = {"params": variables["params"]}
        if "batch_stats" in variables:
            template["batch_stats"] = variables["batch_stats"]
        tree, meta = ckpt.load_best(cfg.model_save_path, fold, template, metric)
        logger.info("fold %d checkpoint (%s tier): val_acc=%s val_loss=%s",
                    fold, metric, meta.get("val_acc"), meta.get("val_loss"))
        bundles.append(bundle)
        var_list.append(tree)

    test_manifest = Manifest.from_csv(cfg.test_csv, is_test=True)
    source = build_source(cfg, test_manifest, cfg.test_dir)
    loader = DataLoader(
        source, test_manifest,
        batch_size=cfg.batch_size * cfg.infer_batch_multiplier,
        sampler=SequentialSampler(len(test_manifest)), pad_last=True,
        device_cache=device_cache_wanted(cfg, source),
    )
    ids, preds, _ = predict_ensemble(bundles, var_list, loader, cfg)
    write_submission(ids, preds, cfg.submission_path, column="predict")


def cmd_bench(args) -> None:
    # bench.py lives at the repo root (the driver's benchmark contract)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)
    sys.argv = ["bench.py"]
    import bench

    bench.main()


def _honor_jax_platforms_env() -> None:
    """Re-assert the documented ``JAX_PLATFORMS`` semantics.

    Platform plugins registered from ``sitecustomize`` may force their own
    platform via ``jax.config`` after jax import, which silently overrides
    the env var (so ``JAX_PLATFORMS=cpu python -m ...cli train`` would still
    run on the accelerator). If the user set the env var and the backend is
    not yet initialized, re-apply it.
    """
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        try:
            jax.config.update("jax_platforms", plat)
        except RuntimeError:
            pass  # backend already live; too late to switch


def main() -> None:
    _honor_jax_platforms_env()
    p = argparse.ArgumentParser(prog="image_classification_tpu")
    sub = p.add_subparsers(dest="command", required=True)
    for name, fn in (("train", cmd_train), ("predict", cmd_predict),
                     ("bench", cmd_bench)):
        sp = sub.add_parser(name)
        sp.add_argument("--config", default=None, help="JSON config file")
        sp.add_argument("--resume", action="store_true",
                        help="resume folds from full-state checkpoints")
        sp.add_argument("--folds", type=lambda s: [int(x) for x in s.split(",")],
                        default=None,
                        help="(predict) fold checkpoints to ensemble, e.g. --folds 1,2,3")
        sp.add_argument("--best-fold", action="store_true",
                        help="(predict) use only the fold with the best stored metric")
        sp.add_argument("--metric", choices=("acc", "loss"), default="acc",
                        help="(predict) checkpoint tier to load/select: "
                             "best-val-acc or best-val-loss (example.py:380-390)")
        sp.add_argument("overrides", nargs="*", help="key=value overrides")
        sp.set_defaults(fn=fn)
    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
