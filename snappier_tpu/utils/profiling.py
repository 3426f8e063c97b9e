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


# --- Runtime call metrics (SNAPPIER_METRICS=1) ------------------------------
#
# The reference has no in-library observability (SURVEY.md §5.5:
# DEBUG-only asserts); a production codec serving bulk traffic wants
# at least per-call timing without attaching a profiler. Opt-in via
# the env flag so the hot paths pay one falsy check when disabled.

import os as _os
import threading as _threading
from collections import defaultdict as _defaultdict

_ENABLED = bool(_os.environ.get("SNAPPIER_METRICS"))
_lock = _threading.Lock()
_stats: dict = _defaultdict(lambda: [0, 0.0, 0])  # name -> [calls, secs, bytes]


def metrics_enabled() -> bool:
    return _ENABLED


@contextlib.contextmanager
def timed_call(name: str, nbytes: int = 0):
    """Accumulate (calls, seconds, bytes) for ``name`` when
    SNAPPIER_METRICS=1; a no-op otherwise. Wrapped around the public
    block/stream entry points."""
    if not _ENABLED:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        with _lock:
            s = _stats[name]
            s[0] += 1
            s[1] += dt
            s[2] += nbytes


def metrics_snapshot() -> dict:
    """{name: {calls, seconds, bytes, MBps}} accumulated so far."""
    with _lock:
        return {
            k: {
                "calls": v[0],
                "seconds": round(v[1], 6),
                "bytes": v[2],
                "MBps": round(v[2] / max(v[1], 1e-12) / 1e6, 2),
            }
            for k, v in _stats.items()
        }


def metrics_reset() -> None:
    with _lock:
        _stats.clear()
