"""Framing-layer mutation-parity sweep (round-5 verdict item 3).

The block layer has the exhaustive 256-tag sweep and a mutation-parity
net whose verdict-comparison class caught a real round-4 decode bug.
The framing state machine (stream.py StreamDecompressor; reference
SnappyStreamDecompressor.cs:215-289) had only ~a dozen hand-written
corruptions — the same engine-parity gap, unpinned. This suite closes
it: seeded mutations over chunk TYPE bytes, 3-byte LENGTH fields, CRC
bytes, payload bytes, and split/truncation points of valid framed
streams, adjudicated across three independent implementations:

* the Python chunk state machine, one-shot (oracle block decode);
* the same machine fed at random byte-split points (scratch-resume
  semantics, SnappyStreamDecompressor.cs:11-36 analog);
* the C++ one-shot ``stpu_stream_decompress``.

All must return the SAME accept/reject verdict and identical bytes on
accept. A planted-bug test proves the comparator has teeth.

Note on strictness: this framework requires the stream to START with
the identifier chunk and validates the sNaPpY magic — the framing
spec's rule. The reference is weaker (its switch treats 0xff as just
another skippable type and never checks the magic), so the parity bar
here is internal consistency at the documented stricter contract.
"""

from __future__ import annotations

import numpy as np
import pytest

from snappier_tpu.errors import InvalidDataError, SnappyError
from snappier_tpu.format import oracle
from snappier_tpu.runtime import stream as stream_rt
from snappier_tpu.runtime.stream import (
    STREAM_HEADER,
    StreamCompressor,
    StreamDecompressor,
)
from tests.conftest import load_corpus_file


def _base_streams() -> list[bytes]:
    """Valid framed streams with diverse chunk mixes: multi-chunk
    compressed, uncompressed fallback, many tiny flush-sealed chunks,
    skippable/padding/mid-stream-identifier chunks, empty stream."""
    rng = np.random.default_rng(501)
    streams = []

    streams.append(
        stream_rt.stream_compress(
            load_corpus_file("html")[:100_000], engine="oracle"
        )
    )  # two compressed data chunks
    streams.append(
        stream_rt.stream_compress(
            rng.integers(0, 256, 3000, np.uint8).tobytes(), engine="oracle"
        )
    )  # uncompressed fallback chunk

    # Many tiny chunks: flush after every 1..60-byte write
    # (SnappyStreamTests.cs:145-192 shape).
    c = StreamCompressor(engine="oracle")
    out = bytearray()
    for _ in range(30):
        out += c.write(
            rng.integers(0, 256, int(rng.integers(1, 60)), np.uint8)
            .tobytes()
        )
        out += c.flush()
    streams.append(bytes(out))

    # Skippable + padding + repeated identifier between data chunks.
    base = stream_rt.stream_compress(b"interleaved " * 400, engine="oracle")
    hdr, body = base[:10], base[10:]
    skippable = bytes([0x90, 5, 0, 0]) + b"skip!"
    padding = bytes([0xFE, 3, 0, 0]) + b"\x00\x00\x00"
    streams.append(hdr + skippable + body + padding + STREAM_HEADER + body)

    streams.append(STREAM_HEADER)  # empty stream (header only)
    return streams


def _chunk_table(s: bytes) -> list[tuple[int, int, int]]:
    """[(header_off, type, payload_len)] for a well-formed stream."""
    recs = []
    pos = 0
    while pos + 4 <= len(s):
        t = s[pos]
        plen = int.from_bytes(s[pos + 1 : pos + 4], "little")
        recs.append((pos, t, plen))
        pos += 4 + plen
    return recs


def _mutants(streams: list[bytes], n_random: int = 60) -> list[bytes]:
    rng = np.random.default_rng(502)
    out: list[bytes] = []
    for s in streams:
        arr = np.frombuffer(s, np.uint8).copy()
        table = _chunk_table(s)
        # Targeted field mutations on every chunk.
        for off, t, plen in table:
            m = arr.copy()  # type byte swept over interesting values
            for nt in (0x00, 0x01, 0x02, 0x50, 0x7F, 0x80, 0xFE, 0xFF):
                m2 = arr.copy()
                m2[off] = nt
                out.append(m2.tobytes())
            for k in range(1, 4):  # length-field bytes
                m2 = arr.copy()
                m2[off + k] ^= int(rng.integers(1, 256))
                out.append(m2.tobytes())
            if t in (0x00, 0x01) and plen >= 4:  # CRC bytes
                for k in range(4):
                    m2 = arr.copy()
                    m2[off + 4 + k] ^= int(rng.integers(1, 256))
                    out.append(m2.tobytes())
            if plen > 4:  # payload byte
                m2 = arr.copy()
                j = off + 4 + 4 + int(rng.integers(0, max(plen - 4, 1)))
                if j < len(m2):
                    m2[j] ^= int(rng.integers(1, 256))
                    out.append(m2.tobytes())
            # Truncations: mid-header, mid-CRC, mid-payload, boundary.
            for cut in (off + 2, off + 5, off + 4 + plen // 2, off):
                if 0 < cut < len(s):
                    out.append(s[:cut])
            # Splice a skippable chunk at this boundary; swap chunks.
            out.append(
                s[:off] + bytes([0x85, 2, 0, 0]) + b"ok" + s[off:]
            )
        if len(table) >= 3:  # reorder two interior chunks
            (o1, _, p1), (o2, _, p2) = table[1], table[2]
            out.append(
                s[:o1] + s[o2 : o2 + 4 + p2] + s[o1 : o1 + 4 + p1]
                + s[o2 + 4 + p2 :]
            )
        # Pre-header chunk: stream must START with the identifier.
        out.append(bytes([0xFE, 0, 0, 0]) + s)
        out.append(bytes([0x90, 1, 0, 0]) + b"x" + s)
        # Random byte flips / extensions.
        for _ in range(n_random):
            m = arr.copy()
            kind = int(rng.integers(0, 8))
            if len(m) and kind < 6:
                for _ in range(int(rng.integers(1, 4))):
                    i = int(rng.integers(0, len(m)))
                    m[i] ^= int(rng.integers(1, 256))
                out.append(m.tobytes())
            else:
                tail = rng.integers(
                    0, 256, int(rng.integers(1, 30)), np.uint8
                ).tobytes()
                out.append(m.tobytes() + tail)
    return out


def _v_oneshot(mb: bytes):
    try:
        return True, stream_rt.stream_decompress(mb, engine="oracle")
    except (SnappyError, InvalidDataError):
        return False, b""


def _v_split(mb: bytes, rng) -> tuple[bool, bytes]:
    """The incremental machine fed at random byte-split points."""
    d = StreamDecompressor(engine="oracle")
    cuts = sorted(
        int(rng.integers(0, len(mb) + 1))
        for _ in range(int(rng.integers(1, 4)))
    )
    pieces, prev = [], 0
    for c in cuts + [len(mb)]:
        pieces.append(mb[prev:c])
        prev = c
    out = bytearray()
    try:
        for p in pieces:
            out += d.decompress(p)
        d.finish()
        return True, bytes(out)
    except (SnappyError, InvalidDataError):
        return False, b""


def _v_native(mb: bytes):
    from snappier_tpu.runtime import native

    try:
        return True, native.stream_decompress(mb)
    except (SnappyError, InvalidDataError):
        return False, b""


def _v_native_mt(mb: bytes):
    """The multithreaded C++ pipeline — an independent header walk +
    parallel chunk decode whose verdicts must match the serial one."""
    from snappier_tpu.runtime import native

    try:
        return True, native.stream_decompress(mb, threads=2)
    except (SnappyError, InvalidDataError):
        return False, b""


def _parity_failures(
    mutants, include_native: bool, min_accepted: int = 20
) -> list[str]:
    """Run the verdict comparison; returns human-readable mismatches
    (empty = full parity). Factored out so the planted-bug test can
    prove the comparator catches a real divergence."""
    rng = np.random.default_rng(503)
    fails = []
    accepted = 0
    for i, mb in enumerate(mutants):
        ok, body = _v_oneshot(mb)
        accepted += ok
        sok, sbody = _v_split(mb, rng)
        if (sok, sbody) != (ok, body):
            fails.append(
                f"mutant {i}: split-feed verdict ({sok}) != one-shot ({ok})"
            )
        if include_native:
            nok, nbody = _v_native(mb)
            if nok != ok or (ok and nbody != body):
                fails.append(
                    f"mutant {i}: native verdict ({nok}) != python ({ok})"
                )
            mok, mbody = _v_native_mt(mb)
            if mok != ok or (ok and mbody != body):
                fails.append(
                    f"mutant {i}: native-MT verdict ({mok}) != python ({ok})"
                )
    assert accepted >= min_accepted, (
        f"sweep degenerate: only {accepted} accepted"
    )
    return fails


@pytest.mark.slow
def test_framing_mutation_verdict_parity():
    from snappier_tpu.runtime import native

    mutants = _mutants(_base_streams())
    assert len(mutants) >= 600
    fails = _parity_failures(mutants, include_native=native.available())
    assert not fails, "\n".join(fails[:20])


def test_framing_parity_comparator_has_teeth(monkeypatch):
    """Plant a bug — a native engine that skips CRC verification and
    returns plausible bytes for a CRC-flipped chunk — and assert the
    comparator reports the divergence (the same teeth demonstration
    the block-layer mutation net carries)."""
    from snappier_tpu.runtime import native as native_rt

    data = (
        np.random.default_rng(1).integers(0, 256, 500, np.uint8).tobytes()
    )
    base = stream_rt.stream_compress(data, engine="oracle")
    arr = bytearray(base)
    arr[14] ^= 0xFF  # flip a CRC byte of the data chunk
    mutant = bytes(arr)

    assert not _v_oneshot(mutant)[0]  # healthy machines reject

    monkeypatch.setattr(
        native_rt, "stream_decompress", lambda mb, threads=0: data
    )  # planted bug: decodes without verifying the chunk CRC
    fails = _parity_failures(
        [mutant], include_native=True, min_accepted=0
    )
    assert fails, "comparator failed to catch the planted CRC-skip bug"
