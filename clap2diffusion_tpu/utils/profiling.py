"""Tracing / profiling harness (absent in the reference — SURVEY.md section 5).

``trace_annotation`` wraps stages in named jax.profiler ranges (visible in
TensorBoard/Perfetto traces via ``start_trace``); ``Timer`` is the
block_until_ready timing harness used by bench.py's latency measurements.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, List, Optional

import jax


@contextlib.contextmanager
def trace_annotation(name: str) -> Iterator[None]:
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace for TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock timing with device synchronization."""

    def __init__(self):
        self.records: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def measure(self, name: str, sync: Optional[jax.Array] = None) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self.records.setdefault(name, []).append(time.perf_counter() - t0)

    def time_fn(self, name: str, fn, *args, warmup: int = 1, iters: int = 5):
        """Record per-iter wall time, synchronizing via host transfer.

        (block_until_ready is unreliable on tunneled backends — e.g. the
        axon platform returns before execution completes; fetching one leaf
        to the host is the only dependable fence.)"""

        def sync(out):
            leaves = jax.tree.leaves(out)
            if leaves:
                jax.device_get(leaves[0])
            return out

        out = None
        for _ in range(warmup):
            out = sync(fn(*args))
        for _ in range(iters):
            t0 = time.perf_counter()
            out = sync(fn(*args))
            self.records.setdefault(name, []).append(time.perf_counter() - t0)
        return out

    def summary(self) -> Dict[str, Dict[str, float]]:
        import numpy as np

        return {
            k: {
                "p50": float(np.median(v)),
                "mean": float(np.mean(v)),
                "min": float(np.min(v)),
                "n": len(v),
            }
            for k, v in self.records.items()
        }
