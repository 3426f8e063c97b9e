"""Profiling helpers (aux-subsystem parity, SURVEY.md §5.1: the
reference profiles offline via BenchmarkDotNet diagnosers; the TPU
equivalent is jax.profiler traces plus throughput accounting)."""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Context manager measuring bytes/s over a region.

    >>> with Throughput(len(data)) as t:
    ...     codec.compress_batch(...)
    >>> t.gbps
    """

    def __init__(self, nbytes: int):
        self.nbytes = nbytes
        self.seconds = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.seconds = time.perf_counter() - self._t0

    @property
    def gbps(self) -> float:
        return self.nbytes / max(self.seconds, 1e-12) / 1e9
