"""Flagship codec pipelines ("models"): bundled, jit-ready end-to-end
compress/decompress computations over block batches."""

from snappier_tpu.models.codec import SnappyCodec  # noqa: F401
