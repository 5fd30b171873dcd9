"""Persistent XLA compilation cache.

TPU compiles of the full train step are expensive (minutes for
ConvNeXt-Base); caching compiled executables on disk makes every rerun —
bench, CLI, tests — start in seconds. Safe to call multiple times.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.expanduser("~/.cache/ic_tpu_xla")


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get("IC_TPU_COMPILE_CACHE", _DEFAULT)
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knobs: skip silently
