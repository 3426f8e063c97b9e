"""Compute ops (L1/L2): vectorized, XLA/Pallas-compiled kernels for the
Snappy block codec and CRC32C. Everything here is jittable, vmappable,
and static-shaped; the batching/padding policy lives in
:mod:`snappier_tpu.runtime`."""

from snappier_tpu.ops.decode import decode_block  # noqa: F401
from snappier_tpu.ops.encode import encode_block  # noqa: F401
from snappier_tpu.ops.crc32c import crc32c_block  # noqa: F401
