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
