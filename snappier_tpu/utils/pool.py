"""Size-bucketed buffer pool (parity: the reference's ``ArrayPool``
usage + ``ByteArrayPoolMemoryOwner.cs``).

Host-side staging buffers (fragment batches, chunk assembly) are
recycled per size bucket to avoid re-allocating multi-megabyte numpy
arrays on every stream write. Buffers are NOT zeroed by default, like
the reference pool, which zeroizes only on dispose
(ByteArrayPoolMemoryOwner.cs:42). Callers own padding determinism:
decode inputs bound every read by the per-row ``lengths`` vector, but
the scan ENCODER's candidate search hashes key windows past a row's
length, so encode-path callers must zero each written row's tail (as
``runtime/stream.py`` does) or pass ``zero=True`` — otherwise the
compressed bytes (valid either way) depend on the previous tenant's
data.
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
        key = (tuple(buf.shape), buf.dtype.str)
        with self._lock:
            bucket = self._buffers[key]
            if len(bucket) < self._max:
                bucket.append(buf)

    def clear(self) -> None:
        with self._lock:
            self._buffers.clear()


#: Process-wide default pool used by the runtime staging paths.
default_pool = BufferPool()
