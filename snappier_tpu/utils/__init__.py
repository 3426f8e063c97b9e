"""Utility layer: bit helpers and buffer pooling."""

from snappier_tpu.utils.helpers import (  # noqa: F401
    find_lsb_set_nonzero,
    left_shift_overflows,
    log2_floor,
)
from snappier_tpu.utils.pool import BufferPool  # noqa: F401
