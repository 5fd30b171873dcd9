"""Image IO: decode-once, then serve batched uint8 arrays from memory.

TPU-first redesign of the reference's per-sample, per-epoch CPU-worker decode
(`dataset.py:38-61`: cv2.imread → BGR→RGB in each DataLoader worker, every
epoch). The dataset is tiny images (60x80), so we decode each image exactly
once into a contiguous uint8 array — optionally backed by a persistent
memory-mapped cache file — and every later epoch's "IO" is a fancy-index.
This is what makes >95% TPU duty cycle trivially achievable: after warmup the
input pipeline is a memory gather.

Failure semantics are preserved: unreadable/missing files become black images
(`dataset.py:54-57`) or random images (`previous/V3-efb2/dataset.py:85-96`),
and lookup tries multiple extensions (`V3.1/dataset.py:74-84`).
"""

from __future__ import annotations

import hashlib
import json
import logging
import os
from concurrent.futures import ThreadPoolExecutor

import cv2
import numpy as np

logger = logging.getLogger("ic_tpu")

_EXTENSIONS = (".jpg", ".jpeg", ".png")


def _resolve_path(img_dir: str, id_: str) -> str | None:
    for ext in _EXTENSIONS:
        p = os.path.join(img_dir, f"{id_}{ext}")
        if os.path.exists(p):
            return p
    return None


def decode_image(
    path: str | None,
    native_size: tuple[int, int],
    fallback: str = "black",
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """Decode one image to RGB uint8 at ``native_size`` (H, W)."""
    h, w = native_size
    img = None
    if path is not None:
        img = cv2.imread(path)  # BGR, None on failure
    if img is None:
        if fallback == "random":
            rng = rng or np.random.default_rng(0)
            return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        return np.zeros((h, w, 3), dtype=np.uint8)
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    if img.shape[:2] != (h, w):
        img = cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)
    return np.ascontiguousarray(img, dtype=np.uint8)


class ImageSource:
    """Serves uint8 (B, H, W, 3) batches for an id list.

    Build once over the *full* manifest; fold subsets index into it. With
    ``cache_dir`` set, the decoded array persists in a memmap keyed by
    (directory, ids, native size) so later runs skip decoding entirely.
    """

    def __init__(
        self,
        img_dir: str,
        ids: np.ndarray,
        native_size: tuple[int, int] = (60, 80),
        fallback: str = "black",
        cache_dir: str | None = None,
        num_threads: int = 16,
    ):
        self.img_dir = img_dir
        self.ids = np.asarray(ids, dtype=object)
        self.native_size = tuple(native_size)
        self.fallback = fallback
        self.num_threads = num_threads
        self._data = self._load_or_build(cache_dir)

    # ------------------------------------------------------------------ build
    def _cache_key(self) -> str:
        hsh = hashlib.sha256()
        hsh.update(os.path.abspath(self.img_dir).encode())
        hsh.update(str(self.native_size).encode())
        for id_ in self.ids:
            hsh.update(str(id_).encode())
            hsh.update(b"\0")
        return hsh.hexdigest()[:16]

    def _decode_all(self, out: np.ndarray) -> None:
        h, w = self.native_size
        rng = np.random.default_rng(0)
        paths = [_resolve_path(self.img_dir, str(i)) for i in self.ids]
        todo = range(len(self.ids))

        # Fast path: native C++ thread-pool decoder (csrc/fastloader.cpp).
        # Anything it rejects (missing, corrupt, non-JPEG) retries via cv2,
        # which applies the configured fallback policy.
        from image_classification_tpu.data import native

        if native.available() and len(self.ids) > 0:
            buf = np.ascontiguousarray(out) if out.flags["C_CONTIGUOUS"] else np.empty_like(out)
            ok = native.decode_batch(paths, buf, num_threads=self.num_threads)
            if buf is not out:
                out[:] = buf
            todo = np.nonzero(~ok)[0]

        n_failed = 0

        def work(i: int) -> None:
            nonlocal n_failed
            if paths[i] is None:
                n_failed += 1
            out[i] = decode_image(paths[i], (h, w), self.fallback, rng)

        with ThreadPoolExecutor(max_workers=self.num_threads) as ex:
            list(ex.map(work, todo))
        if n_failed:
            logger.warning("ImageSource: %d/%d images missing/unreadable",
                           n_failed, len(self.ids))

    def _load_or_build(self, cache_dir: str | None) -> np.ndarray:
        h, w = self.native_size
        shape = (len(self.ids), h, w, 3)
        if cache_dir is None:
            data = np.empty(shape, dtype=np.uint8)
            self._decode_all(data)
            return data
        os.makedirs(cache_dir, exist_ok=True)
        key = self._cache_key()
        bin_path = os.path.join(cache_dir, f"imgs_{key}.u8")
        meta_path = os.path.join(cache_dir, f"imgs_{key}.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            if tuple(meta["shape"]) == shape and meta.get("complete"):
                logger.info("ImageSource: reusing decode cache %s", bin_path)
                return np.memmap(bin_path, dtype=np.uint8, mode="r", shape=shape)
        data = np.memmap(bin_path, dtype=np.uint8, mode="w+", shape=shape)
        logger.info("ImageSource: decoding %d images -> %s", shape[0], bin_path)
        self._decode_all(data)
        data.flush()
        with open(meta_path, "w") as f:
            json.dump({"shape": shape, "complete": True}, f)
        return np.memmap(bin_path, dtype=np.uint8, mode="r", shape=shape)

    # ------------------------------------------------------------------ serve
    def __len__(self) -> int:
        return len(self.ids)

    @property
    def shape(self) -> tuple[int, ...]:
        return self._data.shape

    def get_batch(self, indices: np.ndarray) -> np.ndarray:
        return np.asarray(self._data[indices])

    def device_images(self):
        """The full uint8 image store, resident in device HBM (uploaded once
        per process, shared by every loader over this source). The whole
        reference-scale dataset is ~512 MB — trivially HBM-resident — and
        keeping it on device removes the per-epoch re-upload of every batch
        and any dependence on the host link (docs/PERF_NOTES.md
        epoch-overhead attribution)."""
        if getattr(self, "_device_images", None) is None:
            self._device_images = _chunked_device_upload(self._data)
        return self._device_images

    def nbytes(self) -> int:
        return int(np.prod(self._data.shape))


class ArraySource:
    """In-memory source over a pre-built uint8 array (synthetic data, tests)."""

    def __init__(self, images: np.ndarray):
        if images.dtype != np.uint8 or images.ndim != 4:
            raise ValueError("images must be uint8 (N, H, W, 3)")
        self.images = images
        self.native_size = images.shape[1:3]

    def __len__(self) -> int:
        return len(self.images)

    @property
    def shape(self) -> tuple[int, ...]:
        return self.images.shape

    def get_batch(self, indices: np.ndarray) -> np.ndarray:
        return self.images[indices]

    def device_images(self):
        if getattr(self, "_device_images", None) is None:
            self._device_images = _chunked_device_upload(self.images)
        return self._device_images

    def nbytes(self) -> int:
        return int(self.images.nbytes)


def _chunked_device_upload(data, chunk_mb: int = 16):
    """Upload a big host array as pipelined ~16 MB device_puts, then stitch
    on device. Measured through the axon tunnel (docs/PERF_NOTES.md): one
    monolithic 512 MB device_put runs at 2.3 MB/s (226 s!), 1 MB chunks at
    0.9 MB/s (per-put overhead), 4-64 MB chunks at ~40-44 MB/s with 16 MB
    the sweet spot. The concatenate is a device-side HBM copy (~ms); the
    chunk buffers are dropped right after."""
    import jax
    import jax.numpy as jnp

    data = np.asarray(data)
    per_row = max(1, int(np.prod(data.shape[1:], dtype=np.int64)))
    rows = max(1, (chunk_mb * 1024 * 1024) // per_row)
    if len(data) <= rows:
        return jax.device_put(data)
    chunks = [
        jax.device_put(data[i : i + rows]) for i in range(0, len(data), rows)
    ]
    out = jnp.concatenate(chunks, axis=0)
    out.block_until_ready()
    return out
