"""Utility layer: buffer pooling and profiling.

The reference's bit/byte helpers (``Helpers.cs:66-231``) have no
standalone analog here: Python ints make them one-liners and the
device kernels express the same operations as inline jnp arithmetic;
the size-bound helpers live in :mod:`snappier_tpu.constants`.
"""

from snappier_tpu.utils.pool import BufferPool, default_pool  # noqa: F401
