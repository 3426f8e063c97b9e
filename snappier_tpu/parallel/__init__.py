"""Parallel layer (L5): device meshes and sharded batch codecs."""

from snappier_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    sharded_compress,
    sharded_decompress,
    sharded_roundtrip_step,
)
