"""CSV manifests: the host-side index of the dataset.

Mirrors the reference's CSV-driven datasets (`dataset.py:12-36`: ``id``
column stringified, ``target`` column int; `V3.1/dataset.py:45-50`: schema
validation) and the upfront data-verification pass of the early versions
(`previous/V1-effb0/dataset.py:92-127`: existence check, label-range check,
class-distribution stats).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pandas as pd


@dataclass
class Manifest:
    """Immutable list of (id, label) pairs. ``labels`` is -1 for test sets."""

    ids: np.ndarray          # dtype=object (str)
    labels: np.ndarray       # int64; -1 where unknown (test)
    is_test: bool = False

    def __post_init__(self) -> None:
        self.ids = np.asarray(self.ids, dtype=object)
        self.labels = np.asarray(self.labels, dtype=np.int64)
        if len(self.ids) != len(self.labels):
            raise ValueError("ids and labels length mismatch")

    def __len__(self) -> int:
        return len(self.ids)

    @classmethod
    def from_csv(
        cls,
        path: str | pd.DataFrame,
        is_test: bool = False,
        num_classes: int | None = None,
    ) -> "Manifest":
        df = pd.read_csv(path) if isinstance(path, str) else path
        if "id" not in df.columns:
            raise ValueError(f"manifest missing 'id' column: {list(df.columns)}")
        ids = df["id"].astype(str).to_numpy(dtype=object)
        if not is_test and "target" in df.columns:
            labels = df["target"].astype(int).to_numpy()
            if num_classes is not None:
                bad = (labels < 0) | (labels >= num_classes)
                if bad.any():
                    raise ValueError(
                        f"labels out of range [0,{num_classes}): "
                        f"{np.unique(labels[bad])}"
                    )
        else:
            labels = np.full(len(ids), -1, dtype=np.int64)
        return cls(ids=ids, labels=labels, is_test=is_test)

    def subset(self, indices: np.ndarray) -> "Manifest":
        return Manifest(self.ids[indices], self.labels[indices], self.is_test)

    def to_frame(self) -> pd.DataFrame:
        return pd.DataFrame({"id": self.ids, "target": self.labels})


def class_distribution(labels: np.ndarray, num_classes: int) -> np.ndarray:
    return np.bincount(labels[labels >= 0], minlength=num_classes)


def distribution_stats(labels: np.ndarray, num_classes: int) -> dict:
    counts = class_distribution(labels, num_classes)
    return {
        "num_samples": int(labels.shape[0]),
        "num_classes_present": int((counts > 0).sum()),
        "max": int(counts.max()),
        "min": int(counts.min()),
        "mean": float(counts.mean()),
        "median": float(np.median(counts)),
        "std": float(counts.std()),
    }


def verify_images(
    manifest: Manifest,
    img_dir: str,
    extensions: tuple[str, ...] = (".jpg", ".jpeg", ".png"),
) -> list[str]:
    """Return ids with no file on disk (reference
    `previous/V1-effb0/dataset.py:92-107` upfront verification)."""
    present = set(os.listdir(img_dir)) if os.path.isdir(img_dir) else set()
    missing = []
    for id_ in manifest.ids:
        if not any(f"{id_}{ext}" in present for ext in extensions):
            missing.append(str(id_))
    return missing
