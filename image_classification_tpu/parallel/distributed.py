"""Multi-host (multi-process) runtime support.

On a real multi-host slice (e.g. v4-32), each host runs this same program;
``initialize()`` wires jax.distributed from the standard TPU environment,
and ``host_local_batch_to_global`` assembles a globally-sharded batch from
each host's local shard — the per-host input pipeline feeds only its own
devices, which is the scaling story for the data loader (each host decodes
1/num_hosts of the dataset).

Single-host behavior is unchanged: initialize() is a no-op and
host_local_batch_to_global degenerates to a plain sharded device_put.
"""

from __future__ import annotations

import logging
from typing import Any

import jax
import numpy as np

logger = logging.getLogger("ic_tpu")


def initialize() -> None:
    """Call once at startup on multi-host deployments. Safe to call on a
    single host (no-op).

    Ordering matters: ``jax.distributed.initialize()`` must run before
    anything initializes the local XLA backend, so the guard uses env
    detection + ``jax.distributed.is_initialized()`` (both backend-free) —
    NOT ``jax.process_count()``, which would initialize the backend first
    and make the subsequent ``initialize()`` raise (ADVICE r1)."""
    import os

    env = os.environ
    wants_multihost = bool(
        env.get("COORDINATOR_ADDRESS")
        or env.get("JAX_COORDINATOR_ADDRESS")
        or env.get("JAX_NUM_PROCESSES")
        or env.get("MEGASCALE_COORDINATOR_ADDRESS")
    )
    if not wants_multihost or jax.distributed.is_initialized():
        return
    # jax's own cluster auto-detection covers TPU pods / k8s / SLURM but
    # NOT the generic env-var contract — pass JAX_NUM_PROCESSES /
    # JAX_PROCESS_ID through explicitly so any launcher that exports them
    # (including tests/test_multihost_live.py) works.
    num = env.get("JAX_NUM_PROCESSES")
    pid = env.get("JAX_PROCESS_ID")
    jax.distributed.initialize(
        num_processes=int(num) if num else None,
        process_id=int(pid) if pid else None,
    )
    logger.info(
        "jax.distributed initialized: process %d/%d",
        jax.process_index(), jax.process_count(),
    )


def num_hosts() -> int:
    return jax.process_count()


def host_shard_indices(n: int) -> np.ndarray:
    """The slice of dataset indices this host is responsible for."""
    k = jax.process_index()
    h = jax.process_count()
    per = -(-n // h)
    return np.arange(k * per, min((k + 1) * per, n))


def host_local_batch_to_global(sharding, local_batch: Any):
    """Assemble a global jax.Array from per-host local data. The local
    batch's leading dim must be global_batch / num_hosts."""
    if jax.process_count() == 1:
        return jax.device_put(local_batch, sharding)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x),
        local_batch,
    )
