"""Public block API tests (Snappy facade parity, SnappyTests.cs)."""

import numpy as np
import pytest

import snappier_tpu as st
from snappier_tpu.errors import BufferTooSmallError, InvalidDataError
from snappier_tpu.format import oracle
from tests.conftest import load_corpus_file


def test_roundtrip_html():
    data = load_corpus_file("html")
    comp = st.compress(data)
    assert st.decompress(comp) == data
    assert st.get_uncompressed_length(comp) == len(data)
    assert len(comp) <= st.get_max_compressed_length(len(data))
    # cross-engine anchors
    assert oracle.decompress(comp) == data


def test_compress_into_and_try(tmp_path):
    data = b"compress me please, compress me please, compress me"
    comp = st.compress(data)
    buf = bytearray(len(comp) + 10)
    n = st.compress_into(data, buf)
    assert bytes(buf[:n]) == comp
    ok, n2 = st.try_compress(data, bytearray(len(comp)))
    assert ok and n2 == n
    ok, _ = st.try_compress(data, bytearray(2))
    assert not ok
    with pytest.raises(BufferTooSmallError):
        st.compress_into(data, bytearray(2))


def test_decompress_into_and_try():
    data = b"decompress me please " * 10
    comp = st.compress(data)
    buf = bytearray(len(data) + 5)
    n = st.decompress_into(comp, buf)
    assert bytes(buf[:n]) == data
    ok, n2 = st.try_decompress(comp, bytearray(len(data)))
    assert ok and n2 == len(data)
    ok, _ = st.try_decompress(comp, bytearray(3))
    assert not ok
    with pytest.raises(BufferTooSmallError):
        st.decompress_into(comp, bytearray(3))


def test_corrupt_raises():
    with pytest.raises(InvalidDataError):
        st.decompress(b"")
    with pytest.raises(InvalidDataError):
        st.decompress(b"\xff\xff\xff\xff\x0f\x00")
    for name in ["baddata1.snappy", "baddata2.snappy", "baddata3.snappy"]:
        with pytest.raises(InvalidDataError):
            st.decompress(load_corpus_file(name))


def test_numpy_input():
    arr = np.arange(256, dtype=np.uint8).repeat(4)
    comp = st.compress(arr)
    assert st.decompress(comp) == arr.tobytes()
