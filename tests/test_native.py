"""Native C++ host-runtime tests (cross-engine vs oracle, corrupt
rejection, CRC vectors). Skipped when no toolchain is available."""

import numpy as np
import pytest

from snappier_tpu.errors import InvalidDataError
from snappier_tpu.format import oracle
from snappier_tpu.format.crc32c import crc32c as crc_ref
from snappier_tpu.runtime import native
from tests.conftest import load_corpus_file

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


@pytest.mark.parametrize("name", ["html", "fireworks.jpeg", "urls.10K"])
def test_native_cross_engine(name):
    data = load_corpus_file(name)
    comp = native.compress(data)
    assert native.decompress(comp) == data
    assert oracle.decompress(comp) == data
    assert native.decompress(oracle.compress(data)) == data
    assert native.get_uncompressed_length(comp) == len(data)


def test_native_edge_cases():
    for data in [b"", b"a", b"ab" * 100, bytes(70000), b"x" * 65537]:
        comp = native.compress(data)
        assert native.decompress(comp) == data
        assert oracle.decompress(comp) == data


def test_native_overlap_patterns():
    for off in range(1, 20):
        data = bytes(range(32, 32 + off)) * 200
        assert native.decompress(native.compress(data)) == data
        assert native.decompress(oracle.compress(data)) == data


def test_native_corrupt_rejected():
    for bad in [
        b"",
        b"\xff\xff\xff\xff\xff",
        b"\xff\xff\xff\xff\x0f\x00",
        bytes([10, 3 << 2]) + b"ab",
        bytes([4, 1, 1]),
        bytes([1]),
        bytes([3, (4 - 1) << 2]) + b"abcd",
    ]:
        with pytest.raises(InvalidDataError):
            native.decompress(bad)
    for name in ["baddata1.snappy", "baddata2.snappy", "baddata3.snappy"]:
        with pytest.raises(InvalidDataError):
            native.decompress(load_corpus_file(name))


def test_native_crc32c():
    assert native.crc32c(b"") == 0
    assert native.crc32c(b"123456789") == 0xE3069283
    rng = np.random.default_rng(0)
    for n in [1, 7, 8, 9, 255, 100000]:
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert native.crc32c(data) == crc_ref(data), n
    # incremental append
    a, b = b"hello ", b"world"
    assert native.crc32c(b, native.crc32c(a)) == native.crc32c(a + b)


def test_native_fuzz():
    rng = np.random.default_rng(301)
    for i in range(60):
        size = int(rng.integers(0, 70000)) if i < 10 else int(rng.integers(0, 3000))
        out = np.empty(size, np.uint8)
        pos = 0
        while pos < size:
            run = min(int(rng.geometric(0.08)), size - pos)
            if rng.random() < 0.5:
                out[pos : pos + run] = rng.integers(0, 256)
            else:
                out[pos : pos + run] = rng.integers(0, 256, run, dtype=np.uint8)
            pos += run
        data = out.tobytes()
        assert native.decompress(native.compress(data)) == data, i
        assert oracle.decompress(native.compress(data)) == data, i


def test_native_full_corpus_roundtrip(corpus):
    """All 11 canonical files through the native engine, cross-checked
    on the oracle (CompressAll/DecompressAll breadth, SURVEY.md §6)."""
    for name, data in corpus.items():
        comp = native.compress(data)
        assert native.decompress(comp) == data, name
        assert oracle.decompress(comp) == data, name


def test_native_stream_framing_roundtrip_and_golden():
    """C++ framing pipeline: round trip, golden decode, cross-engine
    compatibility, uncompressed fallback shape
    (SnappyStreamTests.cs:242-262), corrupt CRC rejection."""
    import numpy as np
    import pytest

    from snappier_tpu.errors import InvalidDataError
    from snappier_tpu.runtime import native
    from snappier_tpu.runtime import stream as pstream

    if not native.available():
        pytest.skip("native runtime unavailable")
    plain = load_corpus_file("html_x_4")
    golden = load_corpus_file("html_x_4.snappy")
    if plain is not None and golden is not None:
        assert native.stream_decompress(golden) == plain
    if plain is None:
        plain = b"the quick brown fox " * 5000
    f = native.stream_compress(plain)
    assert native.stream_decompress(f) == plain
    # cross-engine: oracle facade reads native framing and vice versa
    assert pstream.stream_decompress(f, engine="oracle") == plain
    pf = pstream.stream_compress(plain, engine="oracle")
    assert native.stream_decompress(pf) == plain
    # empty stream is just the header
    assert native.stream_compress(b"")[:10] == pstream.STREAM_HEADER
    assert native.stream_decompress(native.stream_compress(b"")) == b""
    # incompressible input takes the uncompressed-fallback chunk shape
    rnd = np.random.default_rng(0).integers(0, 256, 256, np.uint8).tobytes()
    fr = native.stream_compress(rnd)
    assert len(fr) == 10 + 8 + 256
    assert native.stream_decompress(fr) == rnd
    # CRC flip and truncation both reject
    bad = bytearray(f)
    bad[15] ^= 0x40
    with pytest.raises(InvalidDataError):
        native.stream_decompress(bytes(bad))
    with pytest.raises(InvalidDataError):
        native.stream_decompress(f[:-3])
    # data before the stream identifier rejects
    with pytest.raises(InvalidDataError):
        native.stream_decompress(f[10:])


def test_native_stream_sizing_rejects_huge_claims():
    """Regression (round-3 advisor): the sizing walk summed per-chunk
    claimed sizes without the spec's 64 KiB-per-chunk cap, so a tiny
    crafted stream (each chunk claiming ~2 GiB) forced an enormous
    host allocation before decode rejected it."""
    from snappier_tpu.format.varint import write_varint

    hdr = bytes.fromhex("ff060000734e61507059")
    body = write_varint(2**31)  # preamble claims 2 GiB, no tags
    payload = b"\x00\x00\x00\x00" + bytes(body)
    chunk = bytes([0x00]) + len(payload).to_bytes(3, "little") + payload
    with pytest.raises(InvalidDataError):
        native.stream_decompress(hdr + chunk * 4)

    # uncompressed chunk claiming more than the 64 KiB cap
    big = b"z" * 70000
    payload = b"\x00\x00\x00\x00" + big
    chunk = bytes([0x01]) + len(payload).to_bytes(3, "little") + payload
    with pytest.raises(InvalidDataError):
        native.stream_decompress(hdr + chunk)


def test_stream_mt_parity_and_roundtrip():
    """Multithreaded framed-stream pipeline (round-5): output bytes
    must be IDENTICAL to the serial pipeline at every thread count
    (deterministic 64 KiB chunking; per-chunk output depends only on
    that chunk), and round trips must hold across thread counts,
    including the empty stream, sub-chunk inputs, exact-multiple
    sizes, and incompressible (uncompressed-fallback) chunks."""
    import numpy as np

    from snappier_tpu.runtime import native

    if not native.available():
        import pytest

        pytest.skip("native runtime unavailable")
    from tests.conftest import load_corpus_file

    rng = np.random.default_rng(77)
    cases = [
        b"",
        b"x",
        load_corpus_file("html")[:200_000],
        (load_corpus_file("html") * 3)[: 4 * 65536],  # exact multiple
        rng.integers(0, 256, 300_000, np.uint8).tobytes(),  # fallback
    ]
    for data in cases:
        serial = native.stream_compress(data, threads=1)
        for thr in (0, 2, 3):
            assert native.stream_compress(data, threads=thr) == serial
            assert native.stream_decompress(serial, threads=thr) == data


def test_stream_mt_corrupt_verdict_parity():
    """MT decode must reject exactly what the serial pipeline rejects
    (flipped CRC, truncated tail, pre-header chunk, unknown
    unskippable)."""
    import pytest

    from snappier_tpu.errors import InvalidDataError
    from snappier_tpu.runtime import native

    if not native.available():
        pytest.skip("native runtime unavailable")
    from tests.conftest import load_corpus_file

    base = native.stream_compress(
        load_corpus_file("html")[:200_000], threads=1
    )
    mutants = [
        base[:14] + bytes([base[14] ^ 0xFF]) + base[15:],  # CRC flip
        base[:-3],  # truncated tail
        bytes([0xFE, 0, 0, 0]) + base,  # chunk before the identifier
        base[:10] + bytes([0x42, 1, 0, 0, 0]) + base[10:],  # unskippable
    ]
    for i, mb in enumerate(mutants):
        for thr in (1, 0):
            with pytest.raises(InvalidDataError):
                native.stream_decompress(mb, threads=thr)


def test_block_mt_parity_and_roundtrip():
    """Fragment-parallel block codec (round-5): compress output bytes
    identical to serial at every thread count; parallel decompress
    (prescan + per-fragment decode into exact ranges) bit-exact and
    verdict-identical. Decompress defaults to serial (measured
    bandwidth-bound on this host); this exercises the opt-in path."""
    import numpy as np
    import pytest

    from snappier_tpu.runtime import native

    if not native.available():
        pytest.skip("native runtime unavailable")
    from tests.conftest import load_corpus_file

    rng = np.random.default_rng(88)
    html = load_corpus_file("html")
    cases = [
        b"",
        b"x",
        html[:200_000],
        (html * 3)[: 4 * 65536],  # exact fragment multiple
        rng.integers(0, 256, 300_000, np.uint8).tobytes(),
        b"ab" * 150_000,  # overlapping-pattern heavy
    ]
    for data in cases:
        serial = native.compress(data, threads=1)
        for thr in (0, 2, 3):
            assert native.compress(data, threads=thr) == serial
            assert native.decompress(serial, threads=thr) == data
        assert native.decompress(serial) == data  # default (serial)

    # Corrupt-verdict parity: serial and parallel must agree on every
    # mutant (a flipped byte can stay wire-legal — the verdict, not a
    # fixed expectation, is the contract).
    import snappier_tpu.errors as errors

    comp = native.compress(html[:200_000], threads=1)

    def verdict(blob, thr):
        try:
            return True, native.decompress(blob, threads=thr)
        except errors.InvalidDataError:
            return False, b""

    mutants = [comp[:-10]]  # truncation: guaranteed tag overrun
    for pos in (5, 17, len(comp) // 2, len(comp) - 3):
        m = bytearray(comp)
        m[pos] ^= 0xFF
        mutants.append(bytes(m))
    rejected = 0
    for mb in mutants:
        v1 = verdict(mb, 1)
        v0 = verdict(mb, 0)
        assert v1 == v0, "serial/parallel verdict divergence"
        rejected += not v1[0]
    assert rejected >= 1  # the truncation at least must reject


def test_u32_boundary_roundtrip():
    """The wire format's largest legal input (2^32 - 1 bytes) round
    trips bit-exactly — 5-byte varint preamble at scale — and 2^32 is
    rejected, not wrapped. Needs ~13 GB RAM and ~2 min, so it is
    opt-in: SNAPPIER_SCALE_TESTS=1 (wired into the nightly CI job)."""
    import hashlib
    import os

    import numpy as np
    import pytest

    from snappier_tpu.errors import InvalidDataError
    from snappier_tpu.runtime import native

    if not os.environ.get("SNAPPIER_SCALE_TESTS"):
        pytest.skip("set SNAPPIER_SCALE_TESTS=1 (needs ~13 GB RAM)")
    if not native.available():
        pytest.skip("native runtime unavailable")
    from tests.conftest import load_corpus_file

    html = np.frombuffer(load_corpus_file("html"), np.uint8)
    N = (1 << 32) - 1
    blob = np.tile(html, N // len(html) + 1)[:N].tobytes()
    h0 = hashlib.sha256(blob).hexdigest()
    comp = native.compress(blob, threads=0)
    with pytest.raises(InvalidDataError):
        native.compress(blob + b"x", threads=1)
    del blob
    out = native.decompress(comp)
    assert hashlib.sha256(out).hexdigest() == h0
