"""Size-bucketed buffer pool (parity: the reference's ``ArrayPool``
usage + ``ByteArrayPoolMemoryOwner.cs``).

Host-side staging buffers (fragment batches, chunk assembly) are
recycled per size bucket to avoid re-allocating multi-megabyte numpy
arrays on every stream write. Buffers are NOT zeroed by default — the
kernels bound every read by the per-row ``lengths`` vector (garbage
past a row's length is never hashed, emitted, or checksummed), and the
reference pool likewise zeroizes only on dispose
(ByteArrayPoolMemoryOwner.cs:42). Pass ``zero=True`` for callers that
do need deterministic padding.
"""

from __future__ import annotations

import threading
from collections import defaultdict

import numpy as np


class BufferPool:
    """Thread-safe pool of numpy scratch buffers keyed by (shape, dtype)."""

    def __init__(self, max_per_bucket: int = 8) -> None:
        self._buffers: dict = defaultdict(list)
        self._lock = threading.Lock()
        self._max = max_per_bucket

    def rent(self, shape, dtype=np.int32, zero: bool = False) -> np.ndarray:
        key = (tuple(np.atleast_1d(shape).tolist()), np.dtype(dtype).str)
        with self._lock:
            bucket = self._buffers[key]
            if bucket:
                buf = bucket.pop()
                if zero:
                    buf.fill(0)
                return buf
        return np.zeros(shape, dtype) if zero else np.empty(shape, dtype)

    def giveback(self, buf: np.ndarray) -> None:
        key = (buf.shape, buf.dtype.str)
        with self._lock:
            bucket = self._buffers[(tuple(buf.shape), buf.dtype.str)]
            if len(bucket) < self._max:
                bucket.append(buf)

    def clear(self) -> None:
        with self._lock:
            self._buffers.clear()


#: Process-wide default pool used by the runtime staging paths.
default_pool = BufferPool()
