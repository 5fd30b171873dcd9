"""Step timing, throughput, and duty-cycle observability.

The reference had only wall-clock prints and tqdm bars
(`previous/V1-effb0/train.py:218-222`); here the trainer gets per-step device
timing, images/sec, an input-wait vs compute duty-cycle estimate, and an
optional ``jax.profiler`` trace — the north-star metric (>95% duty cycle)
requires measuring host wait time explicitly.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax


@dataclass
class StepTimer:
    """Accumulates where wall time goes in the train loop.

    ``data_time``   — host time spent waiting for the next batch.
    ``step_time``   — time from dispatch until the step's outputs are ready
                      (only measured when ``sync`` blocks, i.e. at log points;
                      between them dispatch is async and overlaps with IO).
    """

    data_time: float = 0.0
    compute_time: float = 0.0
    n_steps: int = 0
    n_images: int = 0
    _t0: float = field(default_factory=time.perf_counter)

    def reset(self) -> None:
        self.data_time = 0.0
        self.compute_time = 0.0
        self.n_steps = 0
        self.n_images = 0
        self._t0 = time.perf_counter()

    @contextlib.contextmanager
    def data_wait(self):
        t = time.perf_counter()
        yield
        self.data_time += time.perf_counter() - t

    @contextlib.contextmanager
    def compute(self, n_images: int = 0):
        t = time.perf_counter()
        yield
        self.compute_time += time.perf_counter() - t
        self.n_steps += 1
        self.n_images += n_images

    @property
    def wall_time(self) -> float:
        return time.perf_counter() - self._t0

    @property
    def duty_cycle(self) -> float:
        """Fraction of wall time NOT spent waiting on input."""
        wall = max(self.wall_time, 1e-9)
        return 1.0 - self.data_time / wall

    @property
    def images_per_sec(self) -> float:
        return self.n_images / max(self.wall_time, 1e-9)

    def summary(self) -> dict[str, float]:
        return {
            "steps": self.n_steps,
            "images_per_sec": round(self.images_per_sec, 2),
            "duty_cycle": round(self.duty_cycle, 4),
            "data_time_s": round(self.data_time, 3),
            "wall_time_s": round(self.wall_time, 3),
        }


@contextlib.contextmanager
def trace(profile_dir: str | None):
    """Optional jax.profiler trace around a region."""
    if profile_dir:
        with jax.profiler.trace(profile_dir):
            yield
    else:
        yield


def block(tree):
    """Block until all arrays in a pytree are ready (for timing)."""
    return jax.block_until_ready(tree)
