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


def test_adversarial_expansion_roundtrips():
    """Regression: expanding input (alternating literal runs with
    extra length bytes and tiny matches) must not overflow the device
    output slot and silently truncate (round-1 advisor finding: the
    old BLOCK_SIZE+128 cap was exceedable by ~118 bytes)."""
    from snappier_tpu.constants import BLOCK_SIZE, greedy_emit_bound
    from snappier_tpu.runtime.block import compress_fragments

    rng = np.random.default_rng(301)
    marker = b"\xf0\xf1\xf2\xf3\xf4"  # 5-byte match: copy-2 at any offset
    parts = [marker]
    n = len(marker)
    while n < BLOCK_SIZE:
        run = rng.integers(0, 256, 257, dtype=np.uint8).tobytes()
        parts += [run, marker]
        n += len(run) + len(marker)
    data = b"".join(parts)[:BLOCK_SIZE]

    frags = np.frombuffer(data, np.uint8).reshape(1, -1).astype(np.int32)
    bodies, body_lens = compress_fragments(
        frags, np.array([BLOCK_SIZE], np.int32)
    )
    blen = int(np.asarray(body_lens)[0])
    assert blen <= greedy_emit_bound(BLOCK_SIZE)
    assert blen <= np.asarray(bodies).shape[1]

    comp = st.compress(data, engine="tpu")
    assert st.decompress(comp, engine="oracle") == data
    assert oracle.decompress(comp) == data


def test_overlapping_buffers_rejected():
    """Contract parity: SnappyCompressor.cs:27 rejects overlapping
    input/output spans (SnappyTests.cs:204-210)."""
    import numpy as np
    import pytest

    from snappier_tpu.errors import InvalidOperationError
    from snappier_tpu.runtime import block

    buf = np.zeros(4096, np.uint8)
    buf[:100] = np.frombuffer((b"overlap test data!" * 6)[:100], np.uint8)
    src = buf[:100]
    dst = buf[50:300]  # overlaps src[50:100]
    for fn in (block.compress_into, block.try_compress):
        with pytest.raises(InvalidOperationError):
            fn(src, dst, engine="oracle")
    # Disjoint views of one buffer are fine.
    n = block.compress_into(buf[:100], buf[200:600], engine="oracle")
    assert n > 0


def test_try_compress_fails_fast_without_device_work():
    """A destination below min_compressed_length returns False before
    any compression happens (Snappy.TryCompress fail-fast shape)."""
    import numpy as np

    from snappier_tpu.constants import min_compressed_length
    from snappier_tpu.runtime import block

    data = b"fail fast please " * 4096  # 64 KiB+
    small = bytearray(min_compressed_length(len(data)) - 1)
    ok, n = block.try_compress(data, small, engine="oracle")
    assert (ok, n) == (False, 0)
    import pytest

    from snappier_tpu.errors import BufferTooSmallError

    with pytest.raises(BufferTooSmallError):
        block.compress_into(data, small, engine="oracle")


def test_try_decompress_fails_fast_on_claimed_length():
    from snappier_tpu.format import oracle
    from snappier_tpu.runtime import block

    comp = oracle.compress(b"y" * 5000)
    ok, n = block.try_decompress(comp, bytearray(4999), engine="oracle")
    assert (ok, n) == (False, 0)
    out = bytearray(5000)
    assert block.decompress_into(comp, out, engine="oracle") == 5000
    assert bytes(out) == b"y" * 5000


def test_min_compressed_length_is_a_true_lower_bound():
    """min_compressed_length must never exceed an actual encoder's
    output, across engines and data shapes."""
    import numpy as np

    from snappier_tpu.constants import min_compressed_length
    from snappier_tpu.format import oracle
    from snappier_tpu.runtime import block

    rng = np.random.default_rng(11)
    cases = [
        b"",
        b"a",
        b"ab" * 40,
        b"a" * 70000,
        bytes(rng.integers(0, 256, 5000, np.uint8)),
        (b"the quick brown fox " * 400)[:7000],
    ]
    for d in cases:
        for eng in ("oracle", "auto"):
            comp = block.compress(d, engine=eng)
            assert len(comp) >= min_compressed_length(len(d)), (
                len(comp), min_compressed_length(len(d)), len(d), eng
            )


def test_tunables_plumbed_through_batch_api():
    """SURVEY §5.6 named tunables (hash-table bits, skip constant) reach
    the device encoder through the batch facade; any setting must stay
    bit-exact on round trip."""
    import numpy as np

    from snappier_tpu.constants import BLOCK_SIZE
    from snappier_tpu.format import oracle
    from snappier_tpu.format.varint import write_varint
    from snappier_tpu.runtime import block

    data = (b"tunable snappy data " * 800)[:16000]
    frags = np.zeros((1, BLOCK_SIZE), np.uint8)
    frags[0, : len(data)] = np.frombuffer(data, np.uint8)
    lengths = np.array([len(data)], np.int32)
    sizes = {}
    for hb, sb in ((14, 32), (10, 32), (14, 64)):
        bodies, blens = block.compress_fragments(
            frags, lengths, hash_bits=hb, skip_base=sb
        )
        comp = write_varint(len(data)) + bytes(
            np.asarray(bodies)[0, : int(np.asarray(blens)[0])]
        )
        assert oracle.decompress(comp) == data, (hb, sb)
        sizes[(hb, sb)] = len(comp)
    assert len(sizes) == 3


def test_compress_level_best_beats_greedy_ratio():
    """level='best' routes to the exact rank-doubling match finder —
    never worse than the reference-style greedy oracle, and bit-exact
    on round trip (framework extension; the reference has one mode)."""
    import pytest

    from snappier_tpu.format import oracle
    from snappier_tpu.runtime import block

    data = bytes(
        (b"the quick brown fox jumps over the lazy dog. " * 400)[:12000]
    )
    best = block.compress(data, level="best")
    assert block.decompress(best, engine="oracle") == data
    assert oracle.decompress(best) == data
    assert len(best) <= len(oracle.compress(data))
    with pytest.raises(ValueError):
        block.compress(data, engine="native", level="best")
    with pytest.raises(ValueError):
        block.compress(data, level="bogus")


def test_level_best_edge_cases_and_density():
    """Round-3 'best': exact-nearest multi-width candidates + scalar
    walk. Must round-trip edge shapes and beat the greedy ratio on
    compressible data."""
    from snappier_tpu.format import oracle
    from snappier_tpu.runtime import block

    cases = [
        b"",
        b"a",
        b"ab" * 40,
        b"x" * 70000,  # multi-fragment long run
        np.random.default_rng(3).integers(
            0, 256, 66000, dtype=np.uint8
        ).tobytes(),  # incompressible across a fragment boundary
    ]
    for data in cases:
        best = block.compress(data, level="best")
        assert block.decompress(best, engine="oracle") == data

    html = load_corpus_file("html")
    greedy = oracle.compress(html)  # reference-style greedy baseline
    best = block.compress(html, level="best")
    assert oracle.decompress(best) == html
    assert len(best) < len(greedy) * 0.92  # measurably denser


@pytest.mark.parametrize("engine", ["native", "oracle", "tpu"])
def test_compress_into_zero_copy_per_engine(engine):
    """Round-4 zero-copy contract (Snappy.cs:37 shape): every engine
    writes into the caller's buffer with no full-output intermediate —
    native emits directly (or via a pooled stage when the destination
    is below worst case), the device path writes the preamble and each
    fetched fragment body in place."""
    from snappier_tpu.runtime import native as native_rt

    if engine == "native" and not native_rt.available():
        pytest.skip("native runtime unavailable")
    data = load_corpus_file("html")[:100_000]
    comp = st.compress(data, engine=engine)

    # Destination >= worst case: native takes the direct-emit path.
    big = np.zeros(st.get_max_compressed_length(len(data)), np.uint8)
    n = st.compress_into(data, big, engine=engine)
    assert n == len(comp) and big[:n].tobytes() == comp

    # Exact-fit destination (below worst case): staged/pooled path.
    exact = bytearray(len(comp))
    n = st.compress_into(data, exact, engine=engine)
    assert n == len(comp) and bytes(exact) == comp

    # One byte short: error raised, try_ variant returns False.
    with pytest.raises(BufferTooSmallError):
        st.compress_into(data, bytearray(len(comp) - 1), engine=engine)
    ok, _ = st.try_compress(data, bytearray(len(comp) - 1), engine=engine)
    assert not ok


def test_compress_into_wide_dtype_engine_parity():
    """A non-uint8 ndarray destination must receive ONE byte per
    ELEMENT from every engine (round-4 review finding: the native
    engine's zero-copy frombuffer path used to pack 4 compressed bytes
    per int32 element, diverging from the device/oracle writes and
    from the element-counted capacity checks)."""
    data = b"engine parity check " * 200
    rows = {}
    for eng in ("native", "oracle", "tpu"):
        buf = np.zeros(10000, np.int32)
        try:
            n = st.compress_into(data, buf, engine=eng)
        except RuntimeError:
            continue  # native unavailable in the no-native CI leg
        rows[eng] = bytes(buf[:n].astype(np.uint8))
        # each engine's into-write must equal its own compress() bytes
        assert rows[eng] == st.compress(data, engine=eng)
    assert len(rows) >= 2

    # Non-contiguous-safe buffers still work on the native fast path.
    if "native" in rows:
        mv = memoryview(bytearray(30000))
        n = st.compress_into(data, mv, engine="native")
        assert bytes(mv[:n]) == rows["native"]


def test_compress_into_rejects_readonly_destination():
    """An immutable destination must raise, never be written through
    (round-4 review finding: np.frombuffer wraps read-only buffers and
    the native C engine would write into e.g. an interned bytes
    object)."""
    data = b"readonly guard " * 100
    for eng in ("native", "oracle", "tpu"):
        for dest in (bytes(20000), memoryview(bytes(20000))):
            try:
                with pytest.raises(TypeError):
                    st.compress_into(data, dest, engine=eng)
            except RuntimeError:
                break  # native unavailable in the no-native leg
    ro = np.zeros(20000, np.uint8)
    ro.flags.writeable = False
    for eng in ("native", "oracle", "tpu"):
        try:
            with pytest.raises((TypeError, ValueError)):
                st.compress_into(data, ro, engine=eng)
        except RuntimeError:
            pass


def test_compress_into_int32_memoryview_engine_parity():
    """A memoryview over a wide-dtype array is element-shaped like the
    array: one byte per element, same as passing the array itself
    (review finding: the native zero-copy path keyed off isinstance
    ndarray and packed 4 bytes/element for the memoryview form)."""
    from snappier_tpu.runtime import native

    if not native.available():
        pytest.skip("native runtime unavailable")
    data = b"mv parity " * 150
    arr = np.zeros(10000, np.int32)
    n = st.compress_into(data, memoryview(arr), engine="native")
    assert bytes(arr[:n].astype(np.uint8)) == st.compress(
        data, engine="native"
    )


@pytest.mark.parametrize("engine", ["native", "oracle", "tpu"])
def test_decompress_into_zero_copy_per_engine(engine):
    """Round-5 zero-copy contract (Snappy.cs:153 /
    SnappyDecompressor.cs:524-527 shape): every engine writes decoded
    bytes into the caller's buffer with no full-output ``bytes``
    intermediate — native decodes byte-precise straight into an
    exactly-sized destination, the device path writes each fetched
    fragment row in place."""
    from snappier_tpu.runtime import native as native_rt

    if engine == "native" and not native_rt.available():
        pytest.skip("native runtime unavailable")
    data = load_corpus_file("html")[:100_000]  # spans two fragments
    comp = st.compress(data, engine="oracle")

    exact = bytearray(len(data))
    n = st.decompress_into(comp, exact, engine=engine)
    assert n == len(data) and bytes(exact) == data

    big = np.zeros(len(data) + 999, np.uint8)
    n = st.decompress_into(comp, big, engine=engine)
    assert big[:n].tobytes() == data

    with pytest.raises(BufferTooSmallError):
        st.decompress_into(comp, bytearray(len(data) - 1), engine=engine)
    ok, _ = st.try_decompress(comp, bytearray(len(data) - 1), engine=engine)
    assert not ok


def test_native_decompress_into_exact_no_spill():
    """The native decoder is byte-precise at the buffer end: decoding
    into an exactly-sized destination never writes past it (the sloppy
    16-byte strides / pattern doubling switch to exact-width copies in
    the last 32 bytes of capacity — snappy_core.cpp stpu_decompress).
    Guard bytes after the destination must stay untouched for streams
    that END in every copy flavor."""
    from snappier_tpu.runtime import native

    if not native.available():
        pytest.skip("native runtime unavailable")
    cases = [
        b"ab" * 40000,  # period-2 overlapping pattern to the last byte
        b"abcdefg" * 9999,  # period-7 pattern tail
        bytes(range(256)) * 300,  # offset >= 16 strided-copy tail
        load_corpus_file("html")[:70_000],  # literal tail
        b"x" * 17,  # small literal (sloppy literal path gated)
    ]
    for data in cases:
        comp = st.compress(data, engine="oracle")
        arr = np.full(len(data) + 64, 0xAA, np.uint8)
        n = native.decompress_into(comp, arr[: len(data)])
        assert n == len(data)
        assert arr[:n].tobytes() == data
        assert (arr[len(data) :] == 0xAA).all(), "sloppy spill past the end"


def test_decompress_into_native_memory_highwater():
    """tracemalloc proof of the zero-copy claim: decoding a 4 MiB
    output through the native direct path allocates no full-output
    intermediate."""
    import tracemalloc

    from snappier_tpu.runtime import native

    if not native.available():
        pytest.skip("native runtime unavailable")
    data = (b"the same phrase over and over " * 200_000)[: 4 << 20]
    comp = st.compress(data, engine="native")
    buf = bytearray(len(data))
    tracemalloc.start()
    try:
        n = native.decompress_into(comp, buf)
        _, peak = tracemalloc.get_traced_memory()
    finally:
        tracemalloc.stop()
    assert n == len(data) and bytes(buf) == data
    assert peak < (1 << 18), f"peak {peak} bytes — full-output intermediate?"


@pytest.mark.parametrize("engine", ["native", "oracle", "tpu"])
def test_to_memory_pooled_owner(engine):
    """Public pooled-owner surface (round-5 verdict missing item 4;
    parity: Snappy.CompressToMemory/DecompressToMemory returning an
    IMemoryOwner over an ArrayPool array, Snappy.cs:99/:223 +
    ByteArrayPoolMemoryOwner.cs:33-55): the caller gets exactly the
    result bytes, can write through the view, and release() zeroizes
    and recycles the backing buffer."""
    from snappier_tpu.errors import InvalidOperationError
    from snappier_tpu.runtime import native as native_rt
    from snappier_tpu.utils import pool as pool_mod

    if engine == "native" and not native_rt.available():
        pytest.skip("native runtime unavailable")
    data = load_corpus_file("html")[:80_000]

    owner = st.compress_to_memory(data, engine=engine)
    comp = bytes(owner.memory)
    assert st.decompress(comp, engine="oracle") == data
    assert len(owner) == len(comp)

    with st.decompress_to_memory(comp, engine=engine) as d:
        assert bytes(d.memory) == data
        assert not d.memory.readonly  # writable, like Memory<byte>
    with pytest.raises(InvalidOperationError):
        d.memory  # released by the context exit

    # Release recycles: the same backing buffer comes back from the
    # pool, zeroized over the result span.
    backing = owner._buf
    owner.release()
    owner.release()  # idempotent
    again = pool_mod.default_pool.rent(backing.shape, backing.dtype)
    try:
        assert again is backing
        assert not again[: len(comp)].any()
    finally:
        pool_mod.default_pool.giveback(again)
