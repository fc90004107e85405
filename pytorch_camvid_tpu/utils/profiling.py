"""Tracing / profiling helpers (SURVEY.md §5.1).

The reference has wall-clock spans (train.py:117,167) and the torch_xla
counter dump ``met.metrics_report()`` (legacy/train_tpu.py:29-31). The
TPU-native equivalents:

- ``StepTimer``: wall-clock spans with a forced device sync (the axon
  tunnel's block_until_ready is unreliable; a tiny host transfer is the
  dependable fence),
- ``trace``: context manager around ``jax.profiler`` writing a TensorBoard
  trace,
- ``metrics_report``: compilation-cache / live-buffer counters, the JAX
  analogue of the XRT counter dump.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import numpy as np
import jax


def sync(x=None):
    """Reliable device fence: forces a host transfer of (a leaf of) x."""
    if x is None:
        return
    leaves = jax.tree_util.tree_leaves(x)
    if leaves:
        np.asarray(jax.device_get(leaves[0])).ravel()[:1]


class StepTimer:
    """Accumulates step wall times; .summary() gives mean/p50/p95 ms."""

    def __init__(self):
        self.times = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        sync(result)
        self.times.append(time.perf_counter() - self._t0)

    @contextlib.contextmanager
    def span(self, result_fn=None):
        self.start()
        yield
        self.stop(result_fn() if result_fn else None)

    def summary(self) -> dict:
        if not self.times:
            return {}
        t = np.asarray(self.times) * 1000.0
        return {"mean_ms": float(t.mean()), "p50_ms": float(np.median(t)),
                "p95_ms": float(np.percentile(t, 95)), "steps": len(t)}


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace to TensorBoard (view with the profile plugin)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def metrics_report() -> str:
    """Runtime counters, analogous to torch_xla met.metrics_report()."""
    lines = []
    try:
        from jax._src import compilation_cache
        lines.append(f"compilation cache enabled: "
                     f"{compilation_cache.is_cache_used(jax.devices()[0])}")
    except Exception:
        pass
    try:
        bufs = jax.live_arrays()
        total = sum(int(np.prod(b.shape)) * b.dtype.itemsize for b in bufs)
        lines.append(f"live arrays: {len(bufs)}, {total / 1e6:.1f} MB")
    except Exception:
        pass
    for d in jax.devices():
        try:
            stats = d.memory_stats()
            if stats:
                lines.append(
                    f"{d}: in_use {stats.get('bytes_in_use', 0) / 1e6:.1f} "
                    f"MB, peak {stats.get('peak_bytes_in_use', 0) / 1e6:.1f}"
                    " MB")
        except Exception:
            pass
    return "\n".join(lines)
