"""Kernel-level tests: the vectorized encoder/decoder/CRC against the
scalar oracle (cross-engine checks are the TPU analog of the
reference's intrinsics-on/off CI matrix, SURVEY.md §4.8)."""

import numpy as np
import jax.numpy as jnp
import pytest

from snappier_tpu.constants import BLOCK_SIZE
from snappier_tpu.format import oracle
from snappier_tpu.format.crc32c import crc32c as crc_host
from snappier_tpu.format.varint import write_varint
from snappier_tpu.ops.crc32c import crc32c_block
from snappier_tpu.ops.decode import decode_block
from snappier_tpu.ops.encode import encode_block
from tests.conftest import load_corpus_file


def device_encode(data: bytes) -> bytes:
    out = bytearray(write_varint(len(data)))
    for start in range(0, max(len(data), 1), BLOCK_SIZE):
        frag = np.frombuffer(data[start : start + BLOCK_SIZE], np.uint8)
        buf = np.zeros(BLOCK_SIZE, np.int32)
        buf[: len(frag)] = frag
        comp, clen = encode_block(jnp.asarray(buf), jnp.int32(len(frag)))
        out += np.asarray(comp)[: int(clen)].astype(np.uint8).tobytes()
    return bytes(out)


def device_decode(comp: bytes, out_cap: int = 1 << 17):
    cap = 1 << 17  # fixed bucket: one compile for the whole module
    assert len(comp) + 8 <= cap
    buf = np.zeros(cap, np.int32)
    buf[: len(comp)] = np.frombuffer(comp, np.uint8)
    out, out_len, err = decode_block(jnp.asarray(buf), jnp.int32(len(comp)), out_cap)
    return np.asarray(out)[: int(out_len)].astype(np.uint8).tobytes(), int(err)


SMALL_CASES = [
    b"",
    b"a",
    b"abc",
    b"a" * 100,
    b"ab" * 300,
    b"the quick brown fox " * 40,
    bytes(1000),
]


@pytest.mark.parametrize("data", SMALL_CASES, ids=range(len(SMALL_CASES)))
def test_encode_decode_roundtrip_small(data):
    comp = device_encode(data)
    # cross-engine: device-compressed must decode on the oracle...
    assert oracle.decompress(comp) == data
    # ...and oracle-compressed must decode on the device.
    got, err = device_decode(oracle.compress(data))
    assert err == 0 and got == data
    # ...and device round-trips with itself.
    got, err = device_decode(comp)
    assert err == 0 and got == data


@pytest.mark.parametrize("name", ["html", "fireworks.jpeg"])
def test_corpus_cross_engine(name):
    data = load_corpus_file(name)[: 2 * BLOCK_SIZE]
    comp = device_encode(data)
    assert oracle.decompress(comp) == data
    assert len(comp) <= len(oracle.compress(data))
    got, err = device_decode(comp)
    assert err == 0 and got == data


def test_decode_rejects_corrupt():
    for bad in [
        b"\xff\xff\xff\xff\xff",  # unterminated varint
        bytes([10, 3 << 2]) + b"ab",  # literal overruns input
        bytes([4, 1, 1]),  # copy before any output
        bytes([1]),  # promised 1 byte, empty body
        bytes([3, (4 - 1) << 2]) + b"abcd",  # extra output vs promise
    ]:
        _, err = device_decode(bad)
        assert err != 0, bad


def test_decode_copy4_and_short_copy2():
    data = bytes([8, (4 - 1) << 2]) + b"abcd" + bytes([3 | (3 << 2), 4, 0, 0, 0])
    got, err = device_decode(data)
    assert err == 0 and got == b"abcdabcd"
    data = bytes([5, (4 - 1) << 2]) + b"wxyz" + bytes([2 | (1 - 1) << 2, 2, 0])
    got, err = device_decode(data)
    assert err == 0 and got == b"wxyzy"


def test_overlapping_copy_patterns():
    """IncrementalCopy semantics (CopyHelpers.cs:64-219): offsets 1..8
    with lengths exceeding the offset replicate the pattern."""
    for off in range(1, 9):
        pattern = bytes(range(97, 97 + off))
        data = pattern * 40
        comp = oracle.compress(data)
        got, err = device_decode(comp)
        assert err == 0 and got == data, off


def test_crc32c_kernel_matches_host():
    rng = np.random.default_rng(5)
    for n in [0, 1, 100, 65535, 65536]:
        data = rng.integers(0, 256, n, dtype=np.uint8)
        buf = np.zeros(BLOCK_SIZE, np.int32)
        buf[:n] = data
        got = int(crc32c_block(jnp.asarray(buf), jnp.int32(n))) & 0xFFFFFFFF
        assert got == crc_host(data.tobytes()), n


def test_fuzz_cross_engine():
    rng = np.random.default_rng(301)
    for i in range(12):
        size = int(rng.integers(60000, 90000)) if i < 3 else int(rng.integers(0, 3000))
        out = np.empty(size, np.uint8)
        pos = 0
        while pos < size:
            run = min(int(rng.geometric(0.05)), size - pos)
            if rng.random() < 0.5:
                out[pos : pos + run] = rng.integers(0, 256)
            else:
                out[pos : pos + run] = rng.integers(0, 256, run, dtype=np.uint8)
            pos += run
        data = out.tobytes()
        comp = device_encode(data)
        assert oracle.decompress(comp) == data
        got, err = device_decode(comp)
        assert err == 0 and got == data
