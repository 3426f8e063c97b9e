"""Framing/stream API tests (SnappyStreamTests.cs parity)."""

import io

import numpy as np
import pytest

import snappier_tpu as st
from snappier_tpu.constants import STREAM_HEADER
from snappier_tpu.errors import InvalidDataError
from snappier_tpu.format import framing
from tests.conftest import load_corpus_file
from snappier_tpu.runtime.stream import (
    SnappyReader,
    SnappyWriter,
    StreamCompressor,
    StreamDecompressor,
)
from tests.conftest import GOLDEN_PAIRS, load_corpus_file


def test_golden_stream_decompress():
    for plain_name, golden_name in GOLDEN_PAIRS:
        plain = load_corpus_file(plain_name)
        golden = load_corpus_file(golden_name)
        got = st.stream_decompress(golden)
        if got != plain:
            assert got.replace(b"\r\n", b"\n") == plain


def test_stream_roundtrip_sizes_beat_reference():
    for plain_name, golden_name in GOLDEN_PAIRS:
        plain = load_corpus_file(plain_name)
        golden = load_corpus_file(golden_name)
        ours = st.stream_compress(plain)
        assert st.stream_decompress(ours) == plain
        assert len(ours) <= len(golden)


def test_stream_roundtrip_multi_chunk():
    data = load_corpus_file("html")  # > 64 KiB: multiple chunks
    framed = st.stream_compress(data)
    assert framed.startswith(STREAM_HEADER)
    assert st.stream_decompress(framed) == data
    # interop with the scalar framing oracle
    assert framing.frame_decompress(framed) == data
    assert st.stream_decompress(framing.frame_compress(data)) == data


def test_uncompressed_fallback_shape():
    """Random bytes don't shrink: expect header + 8-byte chunk overhead
    + raw payload, exactly (SnappyStreamTests.cs:242-262)."""
    rng = np.random.default_rng(42)
    data = rng.integers(0, 256, 256, dtype=np.uint8).tobytes()
    framed = st.stream_compress(data)
    assert len(framed) == 10 + 8 + 256
    assert framed[10] == 0x01  # UncompressedData chunk type
    assert st.stream_decompress(framed) == data


def test_incremental_writer_flush_chunks():
    """Flush after every tiny write creates many chunks; decode must
    resume mid-chunk (SnappyStreamTests.cs:145-192)."""
    rng = np.random.default_rng(301)
    comp = StreamCompressor()
    framed = bytearray()
    plain = bytearray()
    for _ in range(50):
        piece = rng.integers(0, 256, int(rng.integers(1, 100)), dtype=np.uint8).tobytes()
        plain += piece
        framed += comp.write(piece)
        framed += comp.flush()
    # feed back one byte at a time: exercises scratch-resume at every
    # possible boundary
    d = StreamDecompressor()
    out = bytearray()
    for i in range(len(framed)):
        out += d.decompress(framed[i : i + 1])
    d.finish()
    assert bytes(out) == bytes(plain)


def test_file_object_adapters():
    data = load_corpus_file("alice29.txt")
    sink = io.BytesIO()
    with SnappyWriter(sink, leave_open=True) as w:
        for i in range(0, len(data), 10000):
            w.write(data[i : i + 10000])
    framed = sink.getvalue()
    with SnappyReader(io.BytesIO(framed)) as r:
        assert r.read() == data
    # sized reads
    with SnappyReader(io.BytesIO(framed)) as r:
        out = bytearray()
        while True:
            piece = r.read(777)
            if not piece:
                break
            out += piece
        assert bytes(out) == data


def test_stream_errors():
    data = b"hello framing world" * 100
    framed = st.stream_compress(data)
    # flip a payload byte -> CRC mismatch
    bad = bytearray(framed)
    bad[-1] ^= 0xFF
    with pytest.raises(InvalidDataError):
        st.stream_decompress(bytes(bad))
    # missing header
    with pytest.raises(InvalidDataError):
        st.stream_decompress(framed[10:])
    # truncated stream
    with pytest.raises(InvalidDataError):
        st.stream_decompress(framed[:-3])
    # unknown unskippable chunk type
    with pytest.raises(InvalidDataError):
        st.stream_decompress(
            framed[:10] + bytes([0x40, 1, 0, 0, 0]) + framed[10:]
        )
    # skippable + padding chunks are ignored
    ok = framed[:10] + bytes([0xFE, 2, 0, 0, 0, 0]) + bytes([0x90, 1, 0, 0, 7]) + framed[10:]
    assert st.stream_decompress(ok) == data


def test_empty_stream():
    assert st.stream_compress(b"") == STREAM_HEADER
    assert st.stream_decompress(STREAM_HEADER) == b""


def test_known_8192_chunk_stress():
    """Regression data from the reference: a sequence that broke its
    streaming decompress with the default 8192-byte transfer chunks
    (SnappyStreamTests.cs:196-216, streamerrorsequence.txt)."""
    import pathlib

    p = pathlib.Path("/root/reference/Snappier.Tests/TestData/streamerrorsequence.txt")
    if not p.exists():
        pytest.skip("regression data unavailable")
    original = bytes.fromhex(p.read_text().strip().replace("\n", ""))
    sink = io.BytesIO()
    with SnappyWriter(sink, leave_open=True) as w:
        w.write(original)
    framed = sink.getvalue()
    # decode through the 8192-byte transfer-buffer reader path
    with SnappyReader(io.BytesIO(framed)) as r:
        assert r.read() == original
    # and byte-at-a-time incremental feeds
    d = StreamDecompressor()
    out = bytearray()
    for i in range(0, len(framed), 1000):
        out += d.decompress(framed[i : i + 1000])
    d.finish()
    assert bytes(out) == original


def test_async_stream_adapters():
    """Async read/write surface (SnappyStream async variants parity)."""
    import asyncio

    from snappier_tpu.runtime.stream import AsyncSnappyReader, AsyncSnappyWriter

    data = load_corpus_file("asyoulik.txt")

    async def roundtrip():
        sink = io.BytesIO()
        async with AsyncSnappyWriter(sink, leave_open=True) as w:
            for i in range(0, len(data), 30000):
                await w.write(data[i : i + 30000])
            await w.flush()
        out = bytearray()
        async with AsyncSnappyReader(io.BytesIO(sink.getvalue())) as r:
            while True:
                piece = await r.read(50000)
                if not piece:
                    break
                out += piece
        return bytes(out)

    assert asyncio.run(roundtrip()) == data


def test_oversized_compressed_payload_is_spec_legal():
    """The framing format caps only the *uncompressed* chunk size at
    64 KiB; a compressed payload larger than that (e.g. one literal
    tag per byte) is valid and must decode (round-1 advisor finding:
    an artificial compressed-size cap rejected such streams)."""
    from snappier_tpu.constants import CHUNK_COMPRESSED_DATA
    from snappier_tpu.format.crc32c import crc32c, mask_crc
    from snappier_tpu.format.varint import write_varint

    rng = np.random.default_rng(7)
    chunk = rng.integers(0, 256, 65536, dtype=np.uint8).tobytes()
    # Worst-case valid encoding: every byte its own 1-byte literal.
    body = bytearray(write_varint(len(chunk)))
    for b in chunk:
        body += bytes([0x00, b])
    payload = mask_crc(crc32c(chunk)).to_bytes(4, "little") + bytes(body)
    framed = (
        STREAM_HEADER
        + framing.write_chunk_header(CHUNK_COMPRESSED_DATA, len(payload))
        + payload
    )
    assert st.stream_decompress(framed) == chunk


def test_reader_tiny_transfer_over_native_framing():
    """SnappyReader (Python incremental machine, 7-byte transfer reads)
    over a stream produced by the C++ pipeline: cross-implementation
    framing compatibility at pathological feed granularity."""
    import io

    import pytest

    from snappier_tpu.runtime import native
    from snappier_tpu.runtime.stream import SnappyReader

    if not native.available():
        pytest.skip("native runtime unavailable")
    data = load_corpus_file("asyoulik.txt")
    framed = native.stream_compress(data)
    r = SnappyReader(io.BytesIO(framed), transfer_size=7, engine="oracle")
    out = bytearray()
    while True:
        piece = r.read(1000)
        if not piece:
            break
        out += piece
    assert bytes(out) == data


def test_skippable_chunks_through_both_framing_engines():
    """Spec: chunk types 0x80..0xfd and padding 0xfe must be skipped by
    every decoder (SnappyStreamDecompressor.cs:180-199)."""
    import pytest

    from snappier_tpu.format.framing import write_chunk_header
    from snappier_tpu.runtime import native
    from snappier_tpu.runtime.stream import stream_compress, stream_decompress

    data = b"skippable chunk test " * 400
    framed = bytearray(stream_compress(data, engine="oracle"))
    # Insert a skippable chunk and a padding chunk after the header.
    extra = (
        write_chunk_header(0x85, 3) + b"xyz"
        + write_chunk_header(0xFE, 5) + bytes(5)
    )
    framed[10:10] = extra
    framed = bytes(framed)
    assert stream_decompress(framed, engine="oracle") == data
    if native.available():
        assert native.stream_decompress(framed) == data
    # An unknown UNSKIPPABLE type must be rejected by both.
    bad = bytearray(framed)
    bad[10] = 0x7F
    from snappier_tpu.errors import InvalidDataError

    with pytest.raises(InvalidDataError):
        stream_decompress(bytes(bad), engine="oracle")
    if native.available():
        with pytest.raises(InvalidDataError):
            native.stream_decompress(bytes(bad))


def test_oversize_compressed_chunk_routes_to_host():
    """A spec-legal chunk whose COMPRESSED payload exceeds the device
    slot (uncompressed still <= 64 KiB) must decode via the host
    fallback route (stream.py oversize routing) — the framing format
    caps chunk length at 16 MiB - 1, not at the encoder's emission
    bound (SnappyStreamDecompressor.cs imposes no compressed cap)."""
    import numpy as np

    from snappier_tpu.format.crc32c import crc32c as crc_ref
    from snappier_tpu.format.crc32c import mask_crc
    from snappier_tpu.format.varint import write_varint
    from snappier_tpu.runtime.stream import CHUNK_COMP_CAP, stream_decompress

    rng = np.random.default_rng(5)
    plain = rng.integers(0, 256, 65536, dtype=np.uint8).tobytes()
    # Pathological but valid encoding: every byte a 1-byte literal ->
    # 2 bytes of compressed payload per uncompressed byte.
    body = bytearray(write_varint(len(plain)))
    for b in plain:
        body += bytes([0, b])  # literal tag len=1, then the byte
    assert len(body) > CHUNK_COMP_CAP - 8
    payload = mask_crc(crc_ref(plain)).to_bytes(4, "little") + bytes(body)
    tail = st.stream_compress(b"tail-chunk")[len(STREAM_HEADER):]
    framed = (
        STREAM_HEADER
        + bytes([0x00])
        + len(payload).to_bytes(3, "little")
        + payload
        + tail
    )
    assert stream_decompress(framed, engine="tpu") == plain + b"tail-chunk"


def test_async_adapters_concurrent_ops_serialized():
    """Concurrent writes/reads on one async stream must serialize (the
    reference's single-async-operation interlock,
    SnappyStream.cs:611-637) and produce a byte-exact stream."""
    import asyncio
    import io

    from snappier_tpu.runtime.stream import AsyncSnappyReader, AsyncSnappyWriter

    pieces = [bytes([i]) * (997 * (i % 7 + 1)) for i in range(40)]

    async def run():
        sink = io.BytesIO()
        async with AsyncSnappyWriter(sink, leave_open=True,
                                     engine="oracle") as w:
            # gather launches all writes concurrently; the lock must
            # serialize them. asyncio.gather preserves call order for
            # task *creation*, so issue sequentially-awaited batches to
            # assert deterministic output while still overlapping ops.
            await asyncio.gather(*(w.write(p) for p in pieces[:20]))
            await asyncio.gather(w.flush(), *(w.write(p) for p in
                                              pieces[20:]))
        framed = sink.getvalue()
        async with AsyncSnappyReader(io.BytesIO(framed),
                                     engine="oracle") as r:
            outs = await asyncio.gather(*(r.read(4096) for _ in range(200)))
            rest = await r.read()
        return b"".join(outs) + rest

    got = asyncio.run(run())
    # Writes may interleave in completion order, but the lock guarantees
    # chunk-atomicity: the decoded stream is a permutation-free, loss-
    # free concatenation of the pieces in the order the event loop ran
    # the write() coroutines. With gather on a single loop that order
    # is the submission order.
    assert got == b"".join(pieces)


def test_pipelined_subbatches_and_compaction(monkeypatch):
    """Force tiny device sub-batches so the pipelined submit/fetch
    window, the per-sub-batch slot bucketing, and the device-side
    ragged compaction all run hermetically (on TPU these engage at
    256-chunk batches)."""
    import numpy as np

    from snappier_tpu.runtime import stream as S

    monkeypatch.setattr(S, "_SUB_BATCH", 2)
    monkeypatch.setattr(S, "_PIPELINE_DEPTH", 2)
    rng = np.random.default_rng(17)
    # 9 chunks -> 5 sub-batches; mixed compressibility exercises both
    # the compacted and full-slot fetch branches.
    data = (
        b"the snappy corpus " * 9000
        + rng.integers(0, 256, 200_000, dtype=np.uint8).tobytes()
        + b"x" * 150_000
    )
    framed = S.stream_compress(data, engine="tpu")
    assert S.stream_decompress(framed, engine="tpu") == data
    assert S.stream_decompress(framed, engine="oracle") == data


@pytest.mark.parametrize("name", ["html_x_4", "fireworks.jpeg"])
def test_device_framing_corpus_scale(name):
    """Corpus-scale drive of the fused device framing pipeline
    (frame_batch graph: encode + CRC + varint + headers + fallback on
    device) — round-2 review flagged that this path had exactly one
    small hermetic test. Cross-checked against the host engine."""
    data = load_corpus_file(name)
    framed = st.stream_compress(data, engine="tpu")
    assert st.stream_decompress(framed, engine="tpu") == data
    assert st.stream_decompress(framed, engine="oracle") == data
    # the oracle's framing of the same data decodes on the device path
    assert st.stream_decompress(
        st.stream_compress(data, engine="oracle"), engine="tpu"
    ) == data


def test_pool_balanced_when_decode_error_mid_pipeline(monkeypatch):
    """A decode error raised mid-batch must not strand pooled staging
    buffers: the failing sub-batch gives back in ``finally`` and every
    still-queued sub-batch is released by ``_pipeline`` (round-4
    verdict: error paths leaked rented buffers)."""
    import snappier_tpu.runtime.stream as S
    from snappier_tpu.format import oracle
    from snappier_tpu.utils.pool import BufferPool

    monkeypatch.setattr(S, "_SUB_BATCH", 2)
    monkeypatch.setattr(S, "_PIPELINE_DEPTH", 2)

    class CountingPool(BufferPool):
        outstanding = 0

        def rent(self, *a, **kw):
            self.outstanding += 1
            return super().rent(*a, **kw)

        def giveback(self, buf):
            self.outstanding -= 1
            super().giveback(buf)

    pool = CountingPool()
    monkeypatch.setattr(S, "default_pool", pool)

    good = oracle.compress(np.frombuffer(b"hello snappy pool" * 3, np.uint8))
    # Claims 100 output bytes but the tag stream produces 5.
    bad = bytes([100]) + bytes([4 << 2]) + b"abcde"
    payloads = [good, bad] + [good] * 12  # bad fails in sub-batch 0,
    # several sub-batches already submitted and pending behind it
    with pytest.raises(InvalidDataError):
        S._decompress_chunks_batched(payloads, engine="tpu")
    assert pool.outstanding == 0

    # Compress side: balanced on the normal path too.
    chunks = [b"the pool must balance " * 40] * 9
    S._compress_chunks_batched(chunks, engine="tpu")
    assert pool.outstanding == 0
