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
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        order_n = len(self.sampler.epoch_indices(0))
        if self.drop_last:
            return order_n // self.batch_size
        return -(-order_n // self.batch_size)

    # ------------------------------------------------------------- assembly
    def _batches(self) -> Iterator[dict[str, np.ndarray]]:
        order = self.sampler.epoch_indices(self.epoch)
        n = len(order)
        stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for start in range(0, stop, self.batch_size):
            sel = order[start : start + self.batch_size]
            ds_idx = self.indices[sel]
            images = self.source.get_batch(ds_idx)
            labels = self.manifest.labels[ds_idx].astype(np.int32)
            mask = np.ones(len(sel), dtype=bool)
            if len(sel) < self.batch_size and self.pad_last:
                pad = self.batch_size - len(sel)
                images = np.concatenate(
                    [images, np.zeros((pad,) + images.shape[1:], images.dtype)]
                )
                labels = np.concatenate([labels, np.zeros(pad, np.int32)])
                mask = np.concatenate([mask, np.zeros(pad, bool)])
                ds_idx = np.concatenate([ds_idx, np.full(pad, -1)])
            yield {
                "image": images,
                "label": labels,
                "mask": mask,
                "index": ds_idx.astype(np.int64),
            }

    def __iter__(self) -> Iterator[dict[str, Any]]:
        it = self._batches()
        if self.prefetch_depth > 0:
            it = _background(it, self.prefetch_depth)
        if self.mesh is not None:
            from image_classification_tpu.parallel import shard_batch

            for batch in it:
                image, label, mask = shard_batch(
                    self.mesh, batch["image"], batch["label"], batch["mask"]
                )
                yield {
                    "image": image,
                    "label": label,
                    "mask": mask,
                    "index": batch["index"],
                }
        else:
            yield from it

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
