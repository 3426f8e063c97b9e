"""snappier_tpu — a TPU-native Snappy codec framework.

A from-scratch reimplementation of everything brantburnett/Snappier
provides — the Snappy block format, the framing (stream) format with
CRC32C, incremental/resumable stream APIs — architected for TPUs:
the codec hot paths are data-parallel XLA/Pallas kernels over 64 KiB
blocks, batched and sharded across device meshes.

Public facade (parity with the reference's ``Snappy`` /
``SnappyStream`` classes, Snappy.cs / SnappyStream.cs):

>>> import snappier_tpu as st
>>> comp = st.compress(b"hello hello hello hello hello")
>>> st.decompress(comp)
b'hello hello hello hello hello'
"""

from snappier_tpu.errors import (  # noqa: F401
    BufferTooSmallError,
    InvalidDataError,
    InvalidOperationError,
    SnappyError,
)
from snappier_tpu.runtime.block import (  # noqa: F401
    compress,
    compress_into,
    compress_to_memory,
    decompress,
    decompress_into,
    decompress_to_memory,
    get_max_compressed_length,
    get_uncompressed_length,
    try_compress,
    try_decompress,
)
from snappier_tpu.utils.pool import PooledMemory  # noqa: F401

from snappier_tpu.runtime.stream import (  # noqa: F401
    AsyncSnappyReader,
    AsyncSnappyWriter,
    SnappyReader,
    SnappyStream,
    SnappyWriter,
)

__version__ = "0.2.0"


def stream_compress(data: bytes, **kw) -> bytes:
    """Framing-format compress of a whole buffer (SnappyStream write
    path). See :mod:`snappier_tpu.runtime.stream` for incremental IO."""
    from snappier_tpu.runtime.stream import stream_compress as _sc

    return _sc(data, **kw)


def stream_decompress(data: bytes, **kw) -> bytes:
    """Framing-format decompress of a whole buffer (SnappyStream read
    path). See :mod:`snappier_tpu.runtime.stream` for incremental IO."""
    from snappier_tpu.runtime.stream import stream_decompress as _sd

    return _sd(data, **kw)
