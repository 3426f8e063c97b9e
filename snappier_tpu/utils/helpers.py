"""Bit/byte helpers (parity: ``Snappier/Internal/Helpers.cs``).

The reference implements these with BMI/De Bruijn intrinsics
(Helpers.cs:66-231); Python ints make them one-liners, and the device
kernels express the same operations as jnp arithmetic inline. They are
kept as a module so the parity inventory has a home and host-side
callers share one definition.
"""

from __future__ import annotations


def log2_floor(value: int) -> int:
    """floor(log2(value)); -1 for 0 (Helpers.cs:171 semantics)."""
    return value.bit_length() - 1


def find_lsb_set_nonzero(value: int) -> int:
    """Index of the least-significant set bit (Helpers.cs:184-231)."""
    if value == 0:
        raise ValueError("value must be nonzero")
    return (value & -value).bit_length() - 1


def left_shift_overflows(value: int, shift: int, bits: int = 32) -> bool:
    """Would ``value << shift`` lose bits in a ``bits``-wide register?
    (Helpers.cs:66-71)."""
    if shift == 0:
        return False
    return (value >> (bits - shift)) != 0
