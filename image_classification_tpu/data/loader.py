"""Batched loader with background assembly and sharded device prefetch.

Replaces the reference's ``torch.utils.data.DataLoader(num_workers=4,
pin_memory=True)`` multiprocess pipeline (`train_advanced_v4.py:608-622`).
Host work per batch is only a fancy-index out of the decoded uint8 store
(see ``source.py``), done on a background thread ``prefetch_depth`` batches
ahead; device transfer uses an async ``jax.device_put`` with the batch
dimension sharded across the mesh's data axis. All augmentation runs on
device inside the jitted step, so the loader moves raw uint8 — ~14 KB per
60x80 image — keeping host↔device traffic minimal.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Iterator

import numpy as np

from image_classification_tpu.data.manifest import Manifest
from image_classification_tpu.data.sampling import SequentialSampler


_GATHER_CACHE: dict = {}


def _device_gather():
    """Jitted (store, rows, mask) -> zero-padded uint8 batch gather.

    Module-level cache: a closure jitted inside ``__iter__`` would be a new
    function object every epoch and recompile each time (remote-TPU compiles
    are slow — CLAUDE.md platform gotchas)."""
    if "fn" not in _GATHER_CACHE:
        import jax
        import jax.numpy as jnp

        @jax.jit
        def gather(store, rows, mask):
            img = jnp.take(store, rows, axis=0)
            return jnp.where(mask[:, None, None, None], img, jnp.uint8(0))

        _GATHER_CACHE["fn"] = gather
    return _GATHER_CACHE["fn"]


def device_cache_wanted(cfg, source) -> bool:
    """Resolve cfg.hbm_cache ("auto"/"on"/"off") against the source size.
    The DataLoader additionally gates on single-process + single-device at
    iteration time (see ``_cache_active``)."""
    if getattr(cfg, "hbm_cache", "off") == "off":
        return False
    if not hasattr(source, "device_images") or not hasattr(source, "nbytes"):
        return False
    if cfg.hbm_cache == "on":
        return True
    return source.nbytes() <= cfg.hbm_cache_limit_mb * 1024 * 1024


class DataLoader:
    """Yields dict batches: image (B,H,W,3) uint8, label (B,) int32,
    mask (B,) bool (False on padding rows of the final batch)."""

    def __init__(
        self,
        source: Any,
        manifest: Manifest,
        indices: np.ndarray | None = None,
        batch_size: int = 32,
        sampler: Any = None,
        drop_last: bool = False,
        pad_last: bool = True,
        mesh: Any = None,
        prefetch_depth: int = 2,
        process_index: int | None = None,
        process_count: int | None = None,
        device_cache: bool = False,
    ):
        self.source = source
        self.manifest = manifest
        self.indices = (
            np.asarray(indices) if indices is not None else np.arange(len(manifest))
        )
        self.batch_size = batch_size
        self.sampler = sampler or SequentialSampler(len(self.indices))
        if drop_last and pad_last:
            pad_last = False
        self.drop_last = drop_last
        self.pad_last = pad_last
        self.mesh = mesh
        self.prefetch_depth = prefetch_depth
        # Explicit process_index/count override jax's values (testable on one
        # host); on a real multi-host slice the defaults resolve lazily.
        self._process_index = process_index
        self._process_count = process_count
        self.device_cache = device_cache
        self.epoch = 0

    def _cache_active(self) -> bool:
        """HBM-resident images: only single-process, and only when the mesh
        (if any) is a single device — the cache lives on one chip, so a
        multi-chip data axis would funnel every gather through it. Multi-
        device runs keep the host path (their PCIe links are fast; the slow
        tunnel this mode exists for is a single-chip remote-TPU artifact)."""
        if not self.device_cache or not hasattr(self.source, "device_images"):
            return False
        k, h = self._process_info()
        if h > 1:
            return False
        return self.mesh is None or self.mesh.devices.size == 1

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _process_info(self) -> tuple[int, int]:
        if self._process_index is not None:
            return self._process_index, self._process_count or 1
        if self.mesh is None:
            return 0, 1
        import jax

        return jax.process_index(), jax.process_count()

    def __len__(self) -> int:
        order_n = len(self.sampler.epoch_indices(0))
        if self.drop_last:
            return order_n // self.batch_size
        return -(-order_n // self.batch_size)

    # ------------------------------------------------------------- assembly
    def _batches(self, skip_images: bool = False) -> Iterator[dict[str, np.ndarray]]:
        k, h = self._process_info()
        if h > 1:
            yield from self._batches_multihost(k, h)
            return
        order = self.sampler.epoch_indices(self.epoch)
        n = len(order)
        stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for start in range(0, stop, self.batch_size):
            sel = order[start : start + self.batch_size]
            ds_idx = self.indices[sel]
            labels = self.manifest.labels[ds_idx].astype(np.int32)
            mask = np.ones(len(sel), dtype=bool)
            if not skip_images:
                images = self.source.get_batch(ds_idx)
            if len(sel) < self.batch_size and self.pad_last:
                pad = self.batch_size - len(sel)
                if not skip_images:
                    images = np.concatenate(
                        [images, np.zeros((pad,) + images.shape[1:], images.dtype)]
                    )
                labels = np.concatenate([labels, np.zeros(pad, np.int32)])
                mask = np.concatenate([mask, np.zeros(pad, bool)])
                ds_idx = np.concatenate([ds_idx, np.full(pad, -1)])
            batch = {
                "label": labels,
                "mask": mask,
                "index": ds_idx.astype(np.int64),
            }
            if not skip_images:
                batch["image"] = images
            yield batch

    def _batches_multihost(self, k: int, h: int) -> Iterator[dict[str, np.ndarray]]:
        """Per-host slice of each global batch.

        Every process runs the same seeded sampler, so the global epoch order
        is identical everywhere; host ``k`` decodes only rows
        ``[k*per, (k+1)*per)`` of each global batch (1/h of the IO + decode
        work). Ragged final batches are padded to the full global batch size
        with mask=False rows so each host's slice has static shape.
        """
        if self.batch_size % h != 0:
            raise ValueError(
                f"global batch {self.batch_size} not divisible by "
                f"process count {h}"
            )
        if self.drop_last is False and not self.pad_last:
            raise ValueError("multi-host loading requires pad_last or drop_last")
        per = self.batch_size // h
        order = self.sampler.epoch_indices(self.epoch)
        n = len(order)
        stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for start in range(0, stop, self.batch_size):
            sel = order[start : start + self.batch_size]
            rows = np.full(self.batch_size, -1, dtype=np.int64)
            rows[: len(sel)] = sel
            local = rows[k * per : (k + 1) * per]
            valid = local >= 0
            ds_idx = np.where(valid, self.indices[np.maximum(local, 0)], -1)
            decoded = self.source.get_batch(ds_idx[valid])
            images = np.zeros((per,) + decoded.shape[1:], decoded.dtype)
            images[valid] = decoded
            labels = np.zeros(per, np.int32)
            labels[valid] = self.manifest.labels[ds_idx[valid]].astype(np.int32)
            yield {
                "image": images,
                "label": labels,
                "mask": valid,
                "index": ds_idx,
            }

    def __iter__(self) -> Iterator[dict[str, Any]]:
        if self._cache_active():
            yield from self._iter_device_cached()
            return
        it = self._batches()
        if self.prefetch_depth > 0:
            it = _background(it, self.prefetch_depth)
        if self.mesh is not None:
            from image_classification_tpu.parallel.distributed import (
                host_local_batch_to_global,
            )
            from image_classification_tpu.parallel.mesh import batch_sharding

            sharding = batch_sharding(self.mesh)
            for batch in it:
                # single-process: plain async sharded device_put;
                # multi-process: global jax.Array from each host's local slice
                arrays = host_local_batch_to_global(
                    sharding,
                    {k: batch[k] for k in ("image", "label", "mask")},
                )
                yield {**arrays, "index": batch["index"]}
        else:
            yield from it

    def _iter_device_cached(self) -> Iterator[dict[str, Any]]:
        """HBM-resident path: images never transit the host after the one-time
        upload. Per batch, the host ships only indices/labels/mask (~a few
        hundred bytes) and the batch is a device-side gather out of the
        resident store — with padding rows zeroed, matching the host path's
        zero-image padding bit-for-bit."""
        import jax

        dev = self.source.device_images()
        device = dev.devices().pop() if self.mesh is None else None
        gather = _device_gather()

        it = self._batches(skip_images=True)
        if self.prefetch_depth > 0:
            it = _background(it, self.prefetch_depth)
        for batch in it:
            rows = np.maximum(batch["index"], 0).astype(np.int32)
            image = gather(dev, rows, batch["mask"])
            if self.mesh is not None:
                from image_classification_tpu.parallel.mesh import batch_sharding

                sharding = batch_sharding(self.mesh)
                arrays = {
                    "image": jax.device_put(image, sharding),
                    "label": jax.device_put(batch["label"], sharding),
                    "mask": jax.device_put(batch["mask"], sharding),
                }
                yield {**arrays, "index": batch["index"]}
            else:
                yield {
                    "image": image,
                    "label": jax.device_put(batch["label"], device),
                    "mask": jax.device_put(batch["mask"], device),
                    "index": batch["index"],
                }

    def batch_ids(self) -> Iterator[np.ndarray]:
        """Ids per batch in epoch order (sequential samplers; for inference)."""
        order = self.sampler.epoch_indices(self.epoch)
        n = len(order)
        stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for start in range(0, stop, self.batch_size):
            sel = order[start : start + self.batch_size]
            yield self.manifest.ids[self.indices[sel]]


def _background(it: Iterator, depth: int) -> Iterator:
    """Run an iterator on a daemon thread, ``depth`` items ahead."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    _END = object()

    def worker() -> None:
        try:
            for item in it:
                q.put(item)
            q.put(_END)
        except BaseException as e:  # surface exceptions in the consumer
            q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
