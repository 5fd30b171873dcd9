"""Ensemble inference and submission writing.

Reproduces `predict` (`train_advanced_v4.py:349-381`): every fold-model (or
multi-architecture ensemble member, `previous/V2-convbase/config.py:46-51`)
predicts each batch — softmax (with optional TTA averaging) — predictions
are stacked and averaged (optionally weighted), argmaxed, and written as a
reference-compatible CSV: ``id,predict`` (`testdata.py:166-173`) or
``id,target`` (`train_advanced_v4.py:704-712`).
"""

from __future__ import annotations

import logging
from typing import Any, Sequence

import jax
import numpy as np
import pandas as pd

from image_classification_tpu.infer.tta import get_tta
from image_classification_tpu.train.step import (
    make_eval_views,
    make_forward_views,
    tta_num_views,
)

logger = logging.getLogger("ic_tpu")


def _cast_inference_params(variables: dict, cfg) -> dict:
    """One-time bf16 cast of the float32 parameter leaves for inference.

    With ``compute_dtype=bfloat16`` every flax layer casts its params to
    bf16 at use anyway (the math is identical), but the cast re-reads the
    f32 master copy from HBM on every forward — ~350 MB/forward for
    ConvNeXt-B vs ~175 MB pre-cast. The N-fold x 4-view TTA ensemble runs
    2N forwards per batch, so halving parameter traffic is a pure win on
    the inference path (no optimizer needs the f32 masters here).

    Only >=2-D backbone leaves (conv/matmul kernels — >99.9% of the bytes)
    are cast. Excluded, so the math stays bit-identical
    (tests/test_infer_precast.py):
    - 1-D vectors (LN scale/bias, BN stats): the fused block ops run LN
      statistics in f32;
    - classifier heads (``head_fc``, ``aux_head*``): they compute in f32
      by design (scoring-path exactness, models/convnext.py:306).
    Disable with ``infer_cast_params=false``."""
    if cfg.compute_dtype != "bfloat16" or not cfg.infer_cast_params:
        return variables
    import jax.numpy as jnp
    import jax.tree_util as jtu

    def cast(path, a):
        name = jtu.keystr(path)
        if "head_fc" in name or "aux_head" in name:
            return a
        if hasattr(a, "dtype") and a.dtype == jnp.float32 and a.ndim >= 2:
            return a.astype(jnp.bfloat16)
        return a

    return jtu.tree_map_with_path(cast, variables)


def _stackable(bundles: Sequence[Any], variables_list: Sequence[dict]) -> bool:
    """True when every ensemble member shares one module and congruent
    variable trees (the K-fold case) — i.e. params can be stacked on a
    leading model axis and the forward vmapped over it."""
    if len(bundles) < 2 or len({id(b.module) for b in bundles}) != 1:
        return False
    import jax.tree_util as jtu

    ref = jtu.tree_structure(variables_list[0])
    ref_shapes = [x.shape for x in jtu.tree_leaves(variables_list[0])]
    for v in variables_list[1:]:
        if jtu.tree_structure(v) != ref:
            return False
        if [x.shape for x in jtu.tree_leaves(v)] != ref_shapes:
            return False
    return True


def predict_ensemble(
    bundles: Sequence[Any],
    variables_list: Sequence[dict],
    test_loader,
    cfg,
    weights: Sequence[float] | None = None,
) -> tuple[list[str], np.ndarray, np.ndarray]:
    """Returns (image_ids, predictions, mean probabilities)."""
    if not bundles:
        logger.error("no models available for prediction")
        return [], np.array([]), np.array([])
    variables_list = [_cast_inference_params(v, cfg) for v in variables_list]
    tta = get_tta(cfg)
    n_views = tta_num_views(cfg, tta)
    # The preprocessed TTA-view tensor is built ONCE per batch and shared by
    # every fold-model; each model runs one forward over all views stacked
    # along the batch dim (train/step.py make_eval_views).
    views_fn = jax.jit(make_eval_views(cfg, tta))
    if weights is None:
        w = np.ones(len(bundles)) / len(bundles)
    else:
        w = np.asarray(weights, dtype=np.float64)
        w = w / w.sum()
    if _stackable(bundles, variables_list):
        # K-fold ensemble (same architecture, congruent checkpoint trees —
        # cli.cmd_predict passes one bundle K times): run all M models in
        # ONE jitted program per batch — a sequential in-graph loop over
        # the per-fold params with the weighted mean fused in. Collapses M
        # dispatches into one on a ~2 ms/dispatch remote backend and lets
        # XLA overlap the models' forwards. NOT vmapped: vmapping the
        # forward over a stacked model axis measured a 1.5x LOSS on real
        # TPU (136.7 vs 206 img/s, docs/PERF_NOTES.md round 5) — jax's
        # conv batching rule reshapes the model axis into batch, costing a
        # relayout around every conv. Semantics identical to the per-model
        # loop (`train_advanced_v4.py:349-381`): weighted sum of per-model
        # view-averaged softmax.
        base_fwd = make_forward_views(bundles[0], cfg, n_views)
        weights_f = [float(x) for x in w]

        @jax.jit
        def fwd_ensemble(var_list, xb):
            total = None
            for wi, v in zip(weights_f, var_list):
                p = base_fwd(v, xb) * wi
                total = p if total is None else total + p
            return total

        runs = [("stacked", fwd_ensemble, tuple(variables_list))]
    else:
        # Multi-architecture ensemble (`previous/V2-convbase/config.py:46-51`)
        # or shape-mismatched members: one compiled forward per DISTINCT
        # module; fold params stay an argument, not part of the program.
        fwd_cache: dict[int, Any] = {}
        runs = []
        for wi, (b, variables) in enumerate(zip(bundles, variables_list)):
            key = id(b.module)
            if key not in fwd_cache:
                fwd_cache[key] = jax.jit(make_forward_views(b, cfg, n_views))
            runs.append((float(w[wi]), fwd_cache[key], variables))
    ids: list[str] = []
    all_probs: list[np.ndarray] = []
    id_iter = test_loader.batch_ids()
    for batch, batch_ids in zip(test_loader, id_iter):
        xb = views_fn(batch["image"])
        probs_dev = None
        for wi, fwd, variables in runs:
            p = fwd(variables, xb)
            if wi != "stacked":
                p = p * wi
            probs_dev = p if probs_dev is None else probs_dev + p
        probs = np.asarray(probs_dev)  # one device->host pull per batch
        mask = np.asarray(batch["mask"])
        probs = probs[mask]
        all_probs.append(probs)
        ids.extend(str(i) for i in batch_ids)
    probs = np.concatenate(all_probs) if all_probs else np.zeros((0, cfg.num_classes))
    preds = probs.argmax(axis=1)
    return ids, preds, probs


def write_submission(
    ids: Sequence[str],
    preds: np.ndarray,
    path: str,
    column: str = "predict",
) -> pd.DataFrame:
    """``id,predict`` (testdata.py) or ``id,target`` (v4 main) layout."""
    df = pd.DataFrame({"id": list(ids), column: np.asarray(preds, dtype=int)})
    df.to_csv(path, index=False)
    logger.info("wrote %d predictions -> %s", len(df), path)
    return df
