"""L0 format-layer unit tests: varint, CRC32C, size bounds.

Modeled on the reference's algorithm-level tests
(Snappier.Tests/Internal/VarIntEncoding{Read,Write}Tests.cs,
Crc32CAlgorithmTests.cs, HelpersTests.cs)."""

import numpy as np
import pytest

from snappier_tpu.constants import max_block_compressed_length, max_compressed_length
from snappier_tpu.errors import InvalidDataError
from snappier_tpu.format import crc32c as crc
from snappier_tpu.format.varint import read_varint, varint_len, write_varint

# Golden varint vectors (value, encoding) — LEB128 u32 law.
VARINT_VECTORS = [
    (0, b"\x00"),
    (1, b"\x01"),
    (127, b"\x7f"),
    (128, b"\x80\x01"),
    (300, b"\xac\x02"),
    (16383, b"\xff\x7f"),
    (16384, b"\x80\x80\x01"),
    (65536, b"\x80\x80\x04"),
    (0xFFFFFFFF, b"\xff\xff\xff\xff\x0f"),
]


@pytest.mark.parametrize("value,encoding", VARINT_VECTORS)
def test_varint_roundtrip(value, encoding):
    assert write_varint(value) == encoding
    assert varint_len(value) == len(encoding)
    got, consumed = read_varint(encoding + b"\xde\xad")
    assert (got, consumed) == (value, len(encoding))


def test_varint_truncation_rejected():
    with pytest.raises(InvalidDataError):
        read_varint(b"\x80\x80")
    with pytest.raises(InvalidDataError):
        read_varint(b"")
    with pytest.raises(InvalidDataError):
        read_varint(b"\x80\x80\x80\x80\x80\x01")  # 6 bytes
    with pytest.raises(InvalidDataError):
        read_varint(b"\xff\xff\xff\xff\x7f")  # > u32


# CRC32C known-answer vectors (RFC 3720 / upstream test vectors).
CRC_VECTORS = [
    (b"", 0x00000000),
    (b"123456789", 0xE3069283),
    (b"\x00" * 32, 0x8A9136AA),
    (b"\xff" * 32, 0x62A8AB43),
    (bytes(range(32)), 0x46DD794E),
]


@pytest.mark.parametrize("data,expected", CRC_VECTORS)
def test_crc32c_known_answers(data, expected):
    assert crc.crc32c_bytewise(data) == expected
    assert crc.crc32c(data) == expected


def test_crc32c_parallel_matches_bytewise():
    rng = np.random.default_rng(301)
    for n in [1, 2, 7, 255, 256, 1000, 65535, 65536, 65537, 200_000]:
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert crc.crc32c(data) == crc.crc32c_bytewise(data), n


def test_crc32c_combine():
    a, b = b"hello snappy ", b"tpu world"
    combined = crc.crc32c_combine(crc.crc32c(a), crc.crc32c(b), len(b))
    assert combined == crc.crc32c(a + b)
    assert crc.crc32c_combine(crc.crc32c(a), 0, 0) == crc.crc32c(a)


def test_crc_mask_roundtrip():
    for v in [0, 1, 0xDEADBEEF, 0xFFFFFFFF, 0xE3069283]:
        assert crc.unmask_crc(crc.mask_crc(v)) == v
    # Known relation from the framing spec: mask of 0 is the delta.
    assert crc.mask_crc(0) == 0xA282EAD8


def test_max_compressed_length_monotone_and_sufficient():
    prev = 0
    for n in [0, 1, 100, 65536, 1 << 20]:
        bound = max_compressed_length(n)
        assert bound >= n + 1
        assert bound >= prev
        prev = bound
    assert max_block_compressed_length(0) == 33
