"""LIVE multi-process (multi-host) training test.

Spawns two real OS processes, each with 2 virtual CPU devices, wires them
into one 4-device jax.distributed cluster through the package's own
``initialize()`` (env-var contract), and runs 3 real train steps with
per-host loader sharding + ``host_local_batch_to_global`` global-batch
assembly. The per-step losses must match a single-process run of the
identical 4-device program — the SPMD program is the same; only the
process topology differs.

The reference has no distributed training at all (`train_advanced_v4.py:661`
runs one GPU); this pins the multi-host claim in README/SURVEY §2.4 to
executed code rather than wiring.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
REPO_ROOT = os.path.dirname(TESTS_DIR)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
    from image_classification_tpu.data import make_synthetic_dataset

    data_root = str(tmp_path / "data")
    make_synthetic_dataset(
        data_root, n_train=64, n_test=4, num_classes=6,
        native_size=(24, 32), seed=0,
    )
    out_path = str(tmp_path / "mh_result.json")
    port = _free_port()

    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "JAX_NUM_PROCESSES",
                     "JAX_PROCESS_ID", "JAX_COORDINATOR_ADDRESS")
    }
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    worker = os.path.join(TESTS_DIR, "multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port), data_root,
             out_path],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=1800)
        outputs.append(out)
    for p, out in zip(procs, outputs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
    with open(out_path) as f:
        result = json.load(f)
    assert result["device_count"] == 4
    mh_losses = result["losses"]
    assert len(mh_losses) == 3
    assert np.isfinite(mh_losses).all()

    # identical program, single process, same 4-device mesh
    from multihost_worker import run_training, run_training_foldpar

    sp_losses = run_training(data_root, n_steps=3)
    np.testing.assert_allclose(mh_losses, sp_losses, rtol=2e-5, atol=2e-6)
    # and training actually progressed
    assert mh_losses[2] != mh_losses[0]

    # phase 2: fold-parallel (fold=2 x data=2) stacked program — the same
    # mesh set the judged dryrun covers, here live across 2 OS processes
    mh_fp = result["foldpar_losses"]
    assert np.isfinite(mh_fp).all()
    sp_fp = run_training_foldpar(n_steps=3)
    np.testing.assert_allclose(mh_fp, sp_fp, rtol=2e-5, atol=2e-6)
    # both folds progressed and differ (different init keys + batches)
    mh_fp = np.asarray(mh_fp)
    assert (mh_fp[2] != mh_fp[0]).all()
    assert mh_fp[0, 0] != mh_fp[0, 1]
