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


class PooledMemory:
    """Releasable pooled result buffer — the public analog of the
    reference's ``IMemoryOwner<byte>`` returned by
    ``Snappy.CompressToMemory``/``DecompressToMemory``
    (ByteArrayPoolMemoryOwner.cs:33-55): the caller reads ``memory``
    (a writable memoryview of exactly the result bytes) and hands the
    backing buffer back to the pool with :meth:`release` (or by
    exiting the context manager). Parity details: the view is
    zeroized on release, matching the reference's clear-on-dispose
    (:42), and access after release raises, matching its disposed
    ``Memory`` getter (:37-40)."""

    __slots__ = ("_buf", "_len", "_pool")

    def __init__(self, buf: np.ndarray, length: int, pool: BufferPool):
        self._buf = buf
        self._len = length
        self._pool = pool

    @property
    def memory(self) -> memoryview:
        if self._buf is None:
            from snappier_tpu.errors import InvalidOperationError

            raise InvalidOperationError("pooled memory already released")
        return memoryview(self._buf)[: self._len]

    def __len__(self) -> int:
        return self._len

    def __bytes__(self) -> bytes:
        return bytes(self.memory)

    def release(self) -> None:
        """Zeroize the result bytes and return the buffer to the pool
        (idempotent)."""
        if self._buf is not None:
            self._buf[: self._len] = 0
            self._pool.giveback(self._buf)
            self._buf = None

    def __enter__(self) -> "PooledMemory":
        return self

    def __exit__(self, *exc) -> None:
        self.release()


#: Process-wide default pool used by the runtime staging paths.
default_pool = BufferPool()
