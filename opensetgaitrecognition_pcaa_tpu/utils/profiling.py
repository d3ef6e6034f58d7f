"""Profiling utilities: XLA traces + throughput counters.

The reference's only observability is a GPU-memory printout
(``utils.py:14-19``) and wall-clock prints; the TPU-native equivalents
(SURVEY.md §5) are ``jax.profiler`` traces for op-level analysis and
steps/sec / windows/sec counters — the BASELINE.md headline unit.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a ``jax.profiler`` trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Throughput counter with explicit completion forcing.

    NOTE: always time through ``stop(result)`` — it forces a host transfer
    of one leaf. On the axon TPU tunnel ``block_until_ready`` can return
    before the device is actually done, silently inflating throughput
    numbers (observed ~130× — see bench.py).
    """

    def __init__(self) -> None:
        self._t0: Optional[float] = None
        self.total_seconds = 0.0
        self.total_items = 0

    def start(self) -> None:
        self._t0 = time.time()

    def stop(self, result, n_items: int) -> float:
        leaf = jax.tree_util.tree_leaves(result)[0]
        jax.device_get(leaf)  # forces completion
        dt = time.time() - self._t0
        self.total_seconds += dt
        self.total_items += n_items
        return dt

    @property
    def items_per_sec(self) -> float:
        return self.total_items / max(self.total_seconds, 1e-9)

    def summary(self) -> Dict[str, float]:
        return {
            "total_seconds": self.total_seconds,
            "total_items": float(self.total_items),
            "items_per_sec": self.items_per_sec,
        }
