"""Full-file device decode: fragment prescan + batched assembly
(BASELINE config 2 — arbitrary-size inputs through the device kernels;
reference contract: SnappyDecompressor.cs:43-184)."""

import numpy as np
import pytest

import snappier_tpu as st
from snappier_tpu.constants import BLOCK_SIZE
from snappier_tpu.format import oracle
from snappier_tpu.format.varint import write_varint
from snappier_tpu.runtime import prescan
from tests.conftest import load_corpus_file


@pytest.mark.parametrize("name", ["urls.10K", "html_x_4", "fireworks.jpeg"])
def test_multiblock_device_decode(name):
    data = load_corpus_file(name)
    comp = oracle.compress(np.frombuffer(data, np.uint8))
    assert st.decompress(comp, engine="tpu") == data


def test_prescan_python_matches_native():
    from snappier_tpu.runtime import native

    lib = native.load()
    if lib is None or not hasattr(lib, "stpu_scan_fragments"):
        pytest.skip("native runtime unavailable")
    data = load_corpus_file("urls.10K")
    comp = oracle.compress(np.frombuffer(data, np.uint8))
    arr = np.frombuffer(comp, np.uint8)
    rn = native.scan_fragments(bytes(comp))
    rp = prescan.scan_fragments_py(arr)
    assert rn is not None and rp is not None
    assert (rn == rp).all()


def test_prescan_fragment_records_cover_stream():
    data = load_corpus_file("html_x_4")
    comp = oracle.compress(np.frombuffer(data, np.uint8))
    arr = np.frombuffer(comp, np.uint8)
    recs = prescan.scan_fragments_py(arr)
    assert recs is not None
    # every fragment except the last produces exactly 64 KiB
    assert (recs[:-1, prescan.OUT_LEN] == BLOCK_SIZE).all()
    assert int(recs[:, prescan.OUT_LEN].sum()) == len(data)


def _window_crossing_stream():
    """A spec-legal stream whose copy reaches across the 64 KiB output
    line — no known encoder emits this, but the decoder must handle
    it (via the host-serial fallback)."""
    rng = np.random.default_rng(0)
    plain = rng.integers(0, 256, BLOCK_SIZE + 10, dtype=np.uint8).tobytes()
    full = plain + plain[-110:-100]  # copy len 10 offset 110 crossing back
    body = bytearray(write_varint(len(full)))
    body += bytes([(59 + 3) << 2]) + (len(plain) - 1).to_bytes(3, "little")
    body += plain
    body += bytes([2 | (9 << 2)]) + (110).to_bytes(2, "little")
    return bytes(body), full


def test_window_crossing_copy_falls_back():
    comp, full = _window_crossing_stream()
    arr = np.frombuffer(comp, np.uint8)
    assert oracle.decompress(arr) == full  # stream is valid
    assert prescan.scan_fragments_py(arr) is None  # not splittable
    assert st.decompress(comp, engine="tpu") == full  # fallback path


def test_straddling_literal_split():
    """A literal run spanning several 64 KiB lines splits into
    synthetic lead/tail literals with identical bytes."""
    rng = np.random.default_rng(1)
    data = rng.integers(0, 256, 3 * BLOCK_SIZE + 12345, dtype=np.uint8)
    body = bytearray(write_varint(len(data)))
    body += bytes([(59 + 4) << 2]) + (len(data) - 1).to_bytes(4, "little")
    body += data.tobytes()
    comp = bytes(body)
    assert oracle.decompress(np.frombuffer(comp, np.uint8)) == data.tobytes()
    recs = prescan.scan_fragments_py(np.frombuffer(comp, np.uint8))
    assert recs is not None and len(recs) == 4
    assert st.decompress(comp, engine="tpu") == data.tobytes()


def test_straddling_literal_after_tags_native_parity():
    """Regression (round-3 advisor): the native scan closed a fragment
    at a straddling literal with ``tags_begin`` instead of ``ip`` as the
    tags_end, recording an empty tag range and dropping every tag that
    preceded the literal. Encoder-produced streams never straddle, so
    only a hand-crafted stream catches it."""
    from snappier_tpu.runtime import native

    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, 60000, dtype=np.uint8).tobytes()
    plain = a + a[59900:59960]  # copy2 offset=100 len=60 at op=60000
    tail = rng.integers(0, 256, 9940, dtype=np.uint8).tobytes()
    plain += tail  # literal straddling the 64 KiB line at op=60060

    body = bytearray(write_varint(len(plain)))
    body += bytes([(59 + 3) << 2]) + (len(a) - 1).to_bytes(3, "little") + a
    body += bytes([2 | (59 << 2)]) + (100).to_bytes(2, "little")
    body += bytes([(59 + 2) << 2]) + (len(tail) - 1).to_bytes(2, "little")
    body += tail
    comp = bytes(body)
    arr = np.frombuffer(comp, np.uint8)
    assert oracle.decompress(arr) == plain  # stream is valid

    rp = prescan.scan_fragments_py(arr)
    assert rp is not None and len(rp) == 2
    assert rp[0, prescan.TAGS_END] > rp[0, prescan.TAGS_BEGIN]

    lib = native.load()
    if lib is not None and hasattr(lib, "stpu_scan_fragments"):
        rn = native.scan_fragments(comp)
        assert rn is not None
        assert (rn == rp).all()

    assert st.decompress(comp, engine="tpu") == plain


def test_window_crossing_falls_back_everywhere():
    """Round-5: every NEW decode front-end must take the host-serial
    fallback on a window-crossing stream — the MT native decoder
    (its prescan reports the crossing), zero-copy decompress_into, and
    the sharded corpus driver (which must also flag the fallback in
    its meta)."""
    comp, full = _window_crossing_stream()

    from snappier_tpu.runtime import block, native

    if native.available():
        assert native.decompress(comp, threads=0) == full  # MT -> serial
        buf = bytearray(len(full))
        assert native.decompress_into(comp, buf) == len(full)
        assert bytes(buf) == full
    out = bytearray(len(full))
    assert block.decompress_into(comp, out, engine="tpu") == len(full)
    assert bytes(out) == full

    from snappier_tpu.parallel import distributed

    plain, meta = distributed.decompress_corpus_sharded(comp)
    assert plain == full
    assert meta.get("window_crossing_fallback") is True
