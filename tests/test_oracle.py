"""Oracle codec tests: golden-file compatibility, corpus round-trips,
edge cases, and corrupt-input rejection.

Mirrors the reference's contract tests (Snappier.Tests/SnappyTests.cs):
round-trip over the canonical corpus (:8-39), edge-case strings
(:178-202), corrupt input (:244-331), seeded fuzz (:401-446)."""

import numpy as np
import pytest

from snappier_tpu.errors import InvalidDataError
from snappier_tpu.format import framing, oracle
from tests.conftest import GOLDEN_PAIRS, load_corpus_file


@pytest.mark.parametrize("plain_name,golden_name", GOLDEN_PAIRS)
def test_golden_decompress(plain_name, golden_name):
    """Cross-implementation anchor: decode the reference-shipped
    pre-compressed files (framing format) bit-exactly."""
    plain = load_corpus_file(plain_name)
    golden = load_corpus_file(golden_name)
    decoded = framing.frame_decompress(golden)
    if decoded != plain:
        # alice29.snappy was produced from the CRLF variant of the text;
        # git normalizes the .txt on checkout. Normalize before comparing.
        assert decoded.replace(b"\r\n", b"\n") == plain


@pytest.mark.parametrize("plain_name,golden_name", GOLDEN_PAIRS)
def test_compressed_size_beats_reference(plain_name, golden_name):
    """Encoder freedom contract (SURVEY.md §7.1): our framed size must
    be <= the reference's on the golden pairs."""
    plain = load_corpus_file(plain_name)
    golden = load_corpus_file(golden_name)
    ours = framing.frame_compress(plain)
    assert len(ours) <= len(golden), (len(ours), len(golden))
    assert framing.frame_decompress(ours) == plain


def test_corpus_roundtrip(corpus_file):
    name, data = corpus_file
    comp = oracle.compress(data)
    assert oracle.decompress(comp) == data
    assert oracle.get_uncompressed_length(comp) == len(data)
    assert len(comp) <= oracle.compress_bound(len(data))


EDGE_STRINGS = [
    b"",
    b"a",
    b"ab",
    b"abc",
    b"aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",  # overlapping copy, offset 1
    b"ab" * 100,  # offset 2 pattern
    b"0123456789abcdef" * 4 + b"0123456789abcdef",  # offset 16
    bytes(256) + b"x" * 8 + bytes(256),  # offset 256 region
    b"q" * 2047 + b"match me" + b"q" * 2047 + b"match me",  # copy2 offsets
    (b"z" * 65536) + b"tail-after-fragment-boundary" + b"z" * 64,
    bytes(70000),  # long zero run crossing the 64 KiB fragment boundary
]


@pytest.mark.parametrize("data", EDGE_STRINGS, ids=range(len(EDGE_STRINGS)))
def test_edge_strings(data):
    comp = oracle.compress(data)
    assert oracle.decompress(comp) == data


def test_long_literal_lengths():
    """Literal runs needing 1..3 extra length bytes (len 61, 256, 70000
    of incompressible data)."""
    rng = np.random.default_rng(7)
    for n in [60, 61, 256, 4096, 70000]:
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        comp = oracle.compress(data)
        assert oracle.decompress(comp) == data


def test_copy4_decode():
    """The encoder never emits copy-4 tags but the decoder must accept
    them (SnappyDecompressor.cs:305-313)."""
    # varint(8), literal "abcd", copy4 len 4 offset 4
    data = bytes([8, (4 - 1) << 2]) + b"abcd" + bytes([3 | (3 << 2), 4, 0, 0, 0])
    assert oracle.decompress(data) == b"abcdabcd"


def test_copy2_short_lengths_decode():
    """Copy-2 supports lengths 1..64 on decode even though encoders
    only emit >= 4."""
    data = bytes([5, (4 - 1) << 2]) + b"wxyz" + bytes([2 | (1 - 1) << 2, 2, 0])
    assert oracle.decompress(data) == b"wxyzy"


@pytest.mark.parametrize("name", ["baddata1.snappy", "baddata2.snappy", "baddata3.snappy"])
def test_baddata_rejected(name):
    data = load_corpus_file(name)
    with pytest.raises(InvalidDataError):
        oracle.decompress(data)


CORRUPT_CASES = [
    b"",  # no preamble
    b"\xff\xff\xff\xff\xff",  # unterminated varint
    b"\xff\xff\xff\xff\x0f\x00",  # 4 GiB claim, no body
    bytes([10, (4 - 1) << 2]) + b"ab",  # literal overruns input
    bytes([4, 1 | (0 << 2) << 2, 1]),  # copy before any output
    bytes([2, (1 - 1) << 2, 65, 2 | (63 << 2), 1, 0]),  # copy overruns output
    bytes([1]),  # promised 1 byte, empty body
    bytes([3, (4 - 1) << 2]) + b"abcd",  # more output than promised
]


@pytest.mark.parametrize("data", CORRUPT_CASES, ids=range(len(CORRUPT_CASES)))
def test_corrupt_inputs_rejected(data):
    with pytest.raises(InvalidDataError):
        oracle.decompress(data)


def test_fuzz_roundtrip():
    """Seeded fuzz in the shape of SnappyTests.cs:401-446: skewed
    run-length data, sizes crossing the fragment boundary."""
    rng = np.random.default_rng(301)
    for i in range(40):
        size = int(rng.integers(65536, 131072)) if i < 10 else int(rng.integers(0, 4096))
        out = np.empty(size, dtype=np.uint8)
        pos = 0
        while pos < size:
            run = min(int(rng.geometric(0.05)), size - pos)
            if rng.random() < 0.5:
                out[pos : pos + run] = rng.integers(0, 256)
            else:
                out[pos : pos + run] = rng.integers(0, 256, run, dtype=np.uint8)
            pos += run
        data = out.tobytes()
        assert oracle.decompress(oracle.compress(data)) == data


def _parse_tags(comp: bytes):
    """Walk a compressed block's tag stream -> [(kind, length, offset)]."""
    from snappier_tpu.format.varint import read_varint

    body = np.frombuffer(comp, np.uint8)
    _, pos = read_varint(body)
    out = []
    while pos < len(comp):
        t = comp[pos]
        tt = t & 3
        l6 = t >> 2
        if tt == 0:
            if l6 < 60:
                ln, hdr = l6 + 1, 1
            else:
                e = l6 - 59
                ln = int.from_bytes(comp[pos + 1 : pos + 1 + e], "little") + 1
                hdr = 1 + e
            out.append(("lit", ln, 0))
            pos += hdr + ln
        elif tt == 1:
            out.append(("copy", ((t >> 2) & 7) + 4,
                        ((t >> 5) << 8) | comp[pos + 1]))
            pos += 2
        elif tt == 2:
            out.append(("copy", l6 + 1,
                        int.from_bytes(comp[pos + 1 : pos + 3], "little")))
            pos += 3
        else:
            out.append(("copy", l6 + 1,
                        int.from_bytes(comp[pos + 1 : pos + 5], "little")))
            pos += 5
    return out


def test_match_length_contract_across_engines():
    """FindMatchLength parity (SnappyCompressorTests.cs:10-96 analog,
    cases generated rather than ported): for data = s1 + s2 where
    lcp(s1, s2) = k exactly, a greedy encoder must emit a copy of
    length exactly k at offset len(s1) when k >= 4, and no copy at all
    when k < 4."""
    from snappier_tpu.format import oracle
    from snappier_tpu.runtime import block, native

    rng = np.random.default_rng(20260817)
    base = rng.integers(0, 256, 400, np.uint8).tobytes()
    # No accidental matches anywhere: every 4-byte window is unique.
    wins = {base[i : i + 4] for i in range(len(base) - 3)}
    assert len(wins) == len(base) - 3

    def engines():
        # exact=True: exact match finders (dict last-occurrence / rank
        # doubling) must find the match at its exact start. Lossy-table
        # engines may miss the start by a few positions on a hash
        # collision (HashTable.cs is lossy by design) — their contract
        # is a copy at the same offset covering nearly all of the match.
        yield "oracle", lambda d: oracle.compress(d), False  # skip heuristic
        if native.available():
            yield "native", native.compress, False
        yield "scan", lambda d: block.compress(d, level="best"), True

    for k in (0, 1, 2, 3, 4, 5, 7, 8, 11, 15, 16, 31, 32, 47, 63):
        n1 = max(k + 1, 8)
        s1 = base[:n1]
        # s2 = k shared bytes, then a tail disjoint from s1 (so the
        # ONLY possible match is the length-k prefix match).
        # Force the first mismatch byte (a random tail byte could
        # coincide with s1[k] and extend the match).
        s2 = s1[:k] + bytes([s1[k] ^ 0x55]) + base[101 : 100 + (n1 - k)]
        # Distinct tail keeps the input long enough to engage the scan
        # loop (InputMarginBytes=15 stops probing near the end,
        # Constants.cs:27) without adding any other match.
        data = s1 + s2 + base[220:320]
        for name, comp_fn, exact in engines():
            comp = bytes(comp_fn(data))
            assert oracle.decompress(comp) == data, (name, k)
            tags = _parse_tags(comp)
            copies = [t for t in tags if t[0] == "copy"]
            if k < 4:
                assert not copies, (name, k, tags)
            else:
                assert len(copies) == 1, (name, k, tags)
                kind, ln, off = copies[0]
                assert off == n1, (name, k, tags)
                if exact:
                    assert ln == k, (name, k, tags)
                else:
                    assert k - 8 <= ln <= k, (name, k, tags)
