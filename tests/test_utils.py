"""Utility-layer tests (HelpersTests.cs analog)."""

import numpy as np
import pytest

from snappier_tpu.utils import (
    BufferPool,
    find_lsb_set_nonzero,
    left_shift_overflows,
    log2_floor,
)


def test_log2_floor():
    assert log2_floor(0) == -1
    assert log2_floor(1) == 0
    assert log2_floor(2) == 1
    assert log2_floor(3) == 1
    assert log2_floor(4) == 2
    assert log2_floor(0xFFFFFFFF) == 31
    assert log2_floor(1 << 31) == 31


def test_find_lsb():
    assert find_lsb_set_nonzero(1) == 0
    assert find_lsb_set_nonzero(0b1000) == 3
    assert find_lsb_set_nonzero(0x80000000) == 31
    with pytest.raises(ValueError):
        find_lsb_set_nonzero(0)


def test_left_shift_overflows():
    assert not left_shift_overflows(1, 31)
    assert left_shift_overflows(2, 31)
    assert left_shift_overflows(0xFFFF, 17)
    assert not left_shift_overflows(0xFFFF, 16)
    assert not left_shift_overflows(123, 0)


def test_buffer_pool_reuse():
    pool = BufferPool()
    a = pool.rent((64,), np.int32)
    a[:] = 7
    pool.giveback(a)
    b = pool.rent((64,), np.int32)
    assert b is a
    assert (b == 0).all()  # zeroed on rent
    c = pool.rent((64,), np.int32)
    assert c is not b
    d = pool.rent((32,), np.int32)
    assert d.shape == (32,)
