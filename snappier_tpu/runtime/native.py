"""ctypes bindings to the C++ host runtime (``native/snappy_core.cpp``).

The native engine serves the latency path of the framework: buffers
small enough that device dispatch overhead dominates, the byte-fiddling
side of stream state machines, and hosts without an accelerator. The
library is built on demand with the system compiler (no pip deps) and
all entry points degrade gracefully to the NumPy oracle when a
toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
import threading

import numpy as np

from snappier_tpu.constants import plausible_uncompressed_bound
from snappier_tpu.errors import BufferTooSmallError, InvalidDataError

_NATIVE_DIR = pathlib.Path(__file__).resolve().parent.parent.parent / "native"
_SO = _NATIVE_DIR / "libsnappy_core.so"

_lock = threading.Lock()
_lib = None
_load_failed = False

_OK, _INVALID, _TOO_SMALL = 0, 1, 2


def _build() -> bool:
    # Cross-PROCESS exclusion around make: the .so is shared and a
    # non-atomic relink while a sibling process dlopens it yields a
    # half-written library (review finding — parallel pytest legs and
    # the scaling tool's subprocess fan-out start concurrently). The
    # in-process _lock cannot cover this; an O_EXCL-created lockfile
    # with a stale-timeout does.
    import os
    import time

    lockfile = _NATIVE_DIR / ".build.lock"
    deadline = time.monotonic() + 150
    acquired = False
    while time.monotonic() < deadline:
        try:
            fd = os.open(lockfile, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
            acquired = True
            break
        except FileExistsError:
            try:
                if time.time() - lockfile.stat().st_mtime > 180:
                    lockfile.unlink(missing_ok=True)  # stale holder
                    continue
            except OSError:
                pass
            time.sleep(0.1)
    if not acquired:
        return _SO.exists()  # let an existing build stand
    try:
        subprocess.run(
            ["make", "-s", "libsnappy_core.so"],
            cwd=_NATIVE_DIR,
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False
    finally:
        lockfile.unlink(missing_ok=True)


def load():
    """The loaded library, or None if unavailable. SNAPPIER_NO_NATIVE=1
    disables it outright — the CI fallback matrix's analog of the
    reference's COMPlus_EnableHWIntrinsics=0 legs (main.yml:24)."""
    global _lib, _load_failed
    import os

    if os.environ.get("SNAPPIER_NO_NATIVE"):
        return None
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        # Always run make (a no-op when fresh): the .so is gitignored
        # and a stale build silently missing newer entry points is
        # worse than the ~50 ms make probe. Fall back to an existing
        # .so when the toolchain is unavailable.
        if not _build() and not _SO.exists():
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(str(_SO))
        except OSError:
            _load_failed = True
            return None
        lib.stpu_max_compressed_length.restype = ctypes.c_size_t
        lib.stpu_max_compressed_length.argtypes = [ctypes.c_size_t]
        lib.stpu_compress.restype = ctypes.c_int
        lib.stpu_compress.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_size_t),
        ]
        lib.stpu_decompress.restype = ctypes.c_int
        lib.stpu_decompress.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_size_t),
        ]
        lib.stpu_uncompressed_length.restype = ctypes.c_int
        lib.stpu_uncompressed_length.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.stpu_crc32c.restype = ctypes.c_uint32
        lib.stpu_crc32c.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.c_uint32,
        ]
        for name in ("stpu_stream_compress", "stpu_stream_decompress"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int
            fn.argtypes = [
                ctypes.c_char_p,
                ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_size_t),
            ]
        for name in (
            "stpu_stream_compress_mt",
            "stpu_stream_decompress_mt",
            "stpu_compress_mt",
            "stpu_decompress_mt",
        ):
            if not hasattr(lib, name):
                continue
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int
            fn.argtypes = [
                ctypes.c_char_p,
                ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_size_t),
                ctypes.c_int,
            ]
        lib.stpu_stream_max_compressed_length.restype = ctypes.c_size_t
        lib.stpu_stream_max_compressed_length.argtypes = [ctypes.c_size_t]
        lib.stpu_stream_uncompressed_length.restype = ctypes.c_int
        lib.stpu_stream_uncompressed_length.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_uint64),
        ]
        if hasattr(lib, "stpu_match_length_test"):
            lib.stpu_match_length_test.restype = ctypes.c_size_t
            lib.stpu_match_length_test.argtypes = [
                ctypes.c_char_p,
                ctypes.c_size_t,
                ctypes.c_size_t,
                ctypes.c_size_t,
            ]
        if hasattr(lib, "stpu_scan_fragments"):
            lib.stpu_scan_fragments.restype = ctypes.c_int
            lib.stpu_scan_fragments.argtypes = [
                ctypes.c_char_p,
                ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_size_t),
            ]
        _lib = lib
        return _lib


def _writable_view(out):
    """Shared destination classification for the zero-copy ``*_into``
    entry points (one definition so the two directions cannot diverge
    — round-5 review finding): returns a writable uint8 ndarray view
    when ``out``'s raw memory IS its element sequence, None when the
    staging path must handle it, and raises TypeError for read-only
    buffers (round-4 finding: frombuffer happily wraps immutable
    buffers and the C engine would write through them)."""
    try:
        mv = memoryview(out)
    except TypeError:
        return None
    if mv.readonly:
        raise TypeError("destination buffer is read-only")
    if mv.itemsize == 1 and not (
        isinstance(out, np.ndarray) and out.dtype != np.uint8
    ):
        try:
            return np.frombuffer(mv, np.uint8)
        except (ValueError, BufferError, TypeError):
            return None  # non-contiguous / exotic buffer: stage instead
    return None


def _stage_writeback(out, view, stage, n: int) -> int:
    """Copy ``stage[:n]`` into the destination with one byte per
    ELEMENT (engine parity with the device/oracle writes; round-4
    finding: frombuffer on an int32 destination packed 4 bytes per
    element). Raises BufferTooSmallError when it does not fit."""
    cap_avail = view.size if view is not None else len(out)
    if n > cap_avail:
        raise BufferTooSmallError(
            f"need {n} bytes, destination holds {cap_avail}"
        )
    if view is not None:
        view[:n] = stage[:n]
    elif isinstance(out, np.ndarray):
        out[:n] = stage[:n]  # per-element, cast to out's dtype
    else:
        a = np.asarray(out)
        if not a.flags.owndata:
            a[:n] = stage[:n]
        else:
            out[:n] = stage[:n].tobytes()
    return n


def _out_buffer(cap: int):
    """Uninitialized output buffer + ctypes view (a zero-initialized
    `(c_uint8 * cap)()` costs more than the codec work for small
    calls)."""
    arr = np.empty(cap, np.uint8)
    return arr, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def available() -> bool:
    return load() is not None


def _block_compress_raw(lib, data: bytes, out, cap: int, threads: int):
    """One stpu_(compress|compress_mt) call; returns bytes written.
    ``threads``: 0 = hardware concurrency (the MT path self-serializes
    below 8 fragments, where fixed costs rival the win), 1 or any
    negative sentinel = serial; output bytes are identical at every
    count (per-fragment output depends only on that fragment)."""
    out_len = ctypes.c_size_t()
    if threads != 1 and hasattr(lib, "stpu_compress_mt"):
        rc = lib.stpu_compress_mt(
            data, len(data), out, cap, ctypes.byref(out_len), threads
        )
    else:
        rc = lib.stpu_compress(
            data, len(data), out, cap, ctypes.byref(out_len)
        )
    if rc != _OK:
        raise InvalidDataError(f"native compress failed rc={rc}")
    return out_len.value


def compress(data: bytes, threads: int = 0) -> bytes:
    lib = load()
    if lib is None:
        raise RuntimeError("native runtime unavailable")
    data = bytes(data)
    cap = lib.stpu_max_compressed_length(len(data))
    arr, out = _out_buffer(cap)
    n = _block_compress_raw(lib, data, out, cap, threads)
    return arr[:n].tobytes()


def compress_into(data: bytes, out, threads: int = 0) -> int:
    """Compress directly into the writable buffer ``out``. With
    ``threads=1`` the serial encoder emits straight into the caller's
    memory when it is large enough (true zero-copy); the default
    ``threads=0`` routes inputs >= 8 fragments through the parallel
    encoder, which stages fragment slots in an internal C++ scratch
    and compacts into the destination (one extra copy of the
    compressed bytes buys the multi-core encode) — smaller inputs stay
    serial/zero-copy either way. A pooled staging buffer is used when
    the destination is below the worst-case bound; never a full-output
    ``bytes`` intermediate. Returns bytes written; raises
    BufferTooSmallError when the result does not fit.

    The zero-copy path requires a WRITABLE destination whose raw
    memory IS its element sequence (uint8 ndarray, bytearray,
    contiguous byte-sized memoryview). Read-only destinations raise
    TypeError up front (round-4 review finding: frombuffer happily
    wraps immutable buffers and the C engine would write through
    them). Any other element shape (wider-dtype ndarray OR
    memoryview, non-contiguous) takes the staging path with a
    one-byte-per-ELEMENT assignment so the result layout matches the
    device/oracle engines' writes (engine parity — same review:
    frombuffer on an int32 destination used to pack 4 bytes per
    element)."""
    lib = load()
    if lib is None:
        raise RuntimeError("native runtime unavailable")
    data = bytes(data)
    cap = lib.stpu_max_compressed_length(len(data))
    view = _writable_view(out)
    if view is not None and view.size >= cap:
        return _block_compress_raw(
            lib,
            data,
            view.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            view.size,
            threads,
        )
    from snappier_tpu.utils.pool import default_pool

    # Round the stage size to a power-of-two bucket: BufferPool bounds
    # buffers per bucket but not bucket count, so exact per-input caps
    # would grow one bucket per distinct input size (review finding).
    stage_n = 1 << max(10, (max(cap, 1) - 1).bit_length())
    stage = default_pool.rent(stage_n, np.uint8)
    try:
        n = _block_compress_raw(
            lib,
            data,
            stage.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            stage.size,
            threads,
        )
        return _stage_writeback(out, view, stage, n)
    finally:
        default_pool.giveback(stage)


def _block_decompress_raw(lib, data: bytes, out, cap: int, threads: int):
    """One stpu_(decompress|decompress_mt) call; returns bytes written.
    The MT path prescans fragment lines and decodes them in parallel
    (self-serializes at <= one fragment); verdicts and bytes are
    identical to the serial decoder."""
    out_len = ctypes.c_size_t()
    if threads != 1 and hasattr(lib, "stpu_decompress_mt"):
        rc = lib.stpu_decompress_mt(
            data, len(data), out, cap, ctypes.byref(out_len), threads
        )
    else:
        rc = lib.stpu_decompress(
            data, len(data), out, cap, ctypes.byref(out_len)
        )
    if rc == _INVALID:
        raise InvalidDataError("malformed snappy block data")
    if rc == _TOO_SMALL:
        raise BufferTooSmallError("output buffer too small")
    return out_len.value


def decompress(data: bytes, threads: int = 1) -> bytes:
    """Block-format decompress. ``threads`` defaults to the SERIAL
    decoder: the parallel path (prescan at 64 KiB output lines +
    fragment-parallel decode) measured 517-653 MB/s vs 725 serial on
    this 4-vCPU host — the decode is store-bandwidth-bound here and
    the prescan adds a ~37% serial fraction (Amdahl). Pass threads=0
    (auto) or N to opt in on hosts with real memory bandwidth; bytes
    and verdicts are identical either way."""
    lib = load()
    if lib is None:
        raise RuntimeError("native runtime unavailable")
    data = bytes(data)
    val = ctypes.c_uint64()
    rc = lib.stpu_uncompressed_length(data, len(data), ctypes.byref(val))
    if rc != _OK:
        raise InvalidDataError("bad length preamble")
    expected = val.value
    if expected > plausible_uncompressed_bound(len(data)):
        raise InvalidDataError("length preamble exceeds possible expansion")
    # +64 slack: the native decoder's wide copies spill past the
    # logical end (see snappy_core.cpp stpu_decompress contract).
    arr, out = _out_buffer(expected + 64)
    n = _block_decompress_raw(lib, data, out, expected + 64, threads)
    return arr[:n].tobytes()


def decompress_into(data: bytes, out, threads: int = 1) -> int:
    """Decompress directly into the writable buffer ``out`` (zero-copy:
    ``stpu_decompress`` is byte-precise near the buffer end, so it
    writes straight into the caller's memory with no full-output
    intermediate — the analog of the reference decoding into
    ``BufferWriter.GetMemory(expectedLength)``,
    SnappyDecompressor.cs:524-527). Returns bytes written; raises
    BufferTooSmallError when the result does not fit.

    Destination rules match :func:`compress_into`: a writable
    byte-shaped buffer takes the direct path; read-only destinations
    raise TypeError; exotic element shapes fall back to a pooled
    staging buffer with per-element assignment (engine parity)."""
    lib = load()
    if lib is None:
        raise RuntimeError("native runtime unavailable")
    data = bytes(data)
    val = ctypes.c_uint64()
    rc = lib.stpu_uncompressed_length(data, len(data), ctypes.byref(val))
    if rc != _OK:
        raise InvalidDataError("bad length preamble")
    expected = val.value
    if expected > plausible_uncompressed_bound(len(data)):
        raise InvalidDataError("length preamble exceeds possible expansion")
    view = _writable_view(out)
    if view is not None and view.size >= expected:
        return _block_decompress_raw(
            lib,
            data,
            view.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            view.size,
            threads,
        )
    from snappier_tpu.utils.pool import default_pool

    stage_n = 1 << max(10, (max(int(expected) + 64, 1) - 1).bit_length())
    stage = default_pool.rent(stage_n, np.uint8)
    try:
        n = _block_decompress_raw(
            lib,
            data,
            stage.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            stage.size,
            threads,
        )
        return _stage_writeback(out, view, stage, n)
    finally:
        default_pool.giveback(stage)


def scan_fragments(data: bytes):
    """Fragment-split prescan (``stpu_scan_fragments``): walk the tag
    headers of a block stream and split it at exact 64 KiB output
    boundaries. Returns an int64 array [nf, 7] of fragment records
    (see snappy_core.cpp for the layout), or None when the stream
    contains a window-crossing copy (host-serial decode required).
    Raises InvalidDataError on malformed streams."""
    import numpy as np

    lib = load()
    if lib is None or not hasattr(lib, "stpu_scan_fragments"):
        raise RuntimeError("native runtime unavailable")
    data = bytes(data)
    val = ctypes.c_uint64()
    if lib.stpu_uncompressed_length(data, len(data), ctypes.byref(val)) != _OK:
        raise InvalidDataError("bad length preamble")
    max_frags = val.value // 65536 + 3
    recs = np.zeros((max_frags, 7), np.int64)
    nf = ctypes.c_size_t()
    rc = lib.stpu_scan_fragments(
        data,
        len(data),
        recs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        max_frags,
        ctypes.byref(nf),
    )
    if rc == 3:  # STPU_WINDOW_CROSS
        return None
    if rc != _OK:
        raise InvalidDataError("malformed snappy block data")
    return recs[: nf.value]


def match_length_test(buf: bytes, a: int, b: int, b_limit: int) -> int:
    """TEST HOOK: the C++ engine's FindMatchLength analog
    (snappy_core.cpp match_length), exercised by the golden-vector
    table ported from SnappyCompressorTests.cs:10-96."""
    lib = load()
    if lib is None or not hasattr(lib, "stpu_match_length_test"):
        raise RuntimeError("native runtime unavailable")
    return int(lib.stpu_match_length_test(bytes(buf), a, b, b_limit))


def crc32c(data: bytes, crc: int = 0) -> int:
    lib = load()
    if lib is None:
        raise RuntimeError("native runtime unavailable")
    data = bytes(data)
    return int(lib.stpu_crc32c(data, len(data), crc))


def get_uncompressed_length(data: bytes) -> int:
    lib = load()
    if lib is None:
        raise RuntimeError("native runtime unavailable")
    data = bytes(data)
    val = ctypes.c_uint64()
    rc = lib.stpu_uncompressed_length(data, len(data), ctypes.byref(val))
    if rc != _OK:
        raise InvalidDataError("bad length preamble")
    return val.value


def stream_compress(data: bytes, threads: int = 0) -> bytes:
    """One-shot framing-format compress in the C++ runtime (chunking,
    CRC32C, headers, uncompressed fallback — the host IO pipeline
    behind the Python facade's one-shot path).

    ``threads``: 0 = one worker per hardware thread (capped at the
    chunk count, so small inputs never spawn), 1 = the serial
    pipeline, N = exactly N workers. Output bytes are identical at
    every thread count (chunking is deterministic; per-chunk output
    depends only on that chunk)."""
    lib = load()
    if lib is None:
        raise RuntimeError("native runtime unavailable")
    data = bytes(data)
    cap = lib.stpu_stream_max_compressed_length(len(data))
    arr, out = _out_buffer(cap)
    out_len = ctypes.c_size_t()
    if threads != 1 and hasattr(lib, "stpu_stream_compress_mt"):
        rc = lib.stpu_stream_compress_mt(
            data, len(data), out, cap, ctypes.byref(out_len), threads
        )
    else:
        rc = lib.stpu_stream_compress(
            data, len(data), out, cap, ctypes.byref(out_len)
        )
    if rc != _OK:
        raise InvalidDataError(f"native stream compress failed rc={rc}")
    return arr[: out_len.value].tobytes()


def stream_decompress(data: bytes, threads: int = 0) -> bytes:
    """One-shot framing-format decompress with full CRC verification.
    ``threads`` as in :func:`stream_compress`; data chunks decode in
    parallel into their exact output ranges (byte-precise decoder),
    verdicts identical to the serial pipeline."""
    lib = load()
    if lib is None:
        raise RuntimeError("native runtime unavailable")
    data = bytes(data)
    total = ctypes.c_uint64()
    rc = lib.stpu_stream_uncompressed_length(
        data, len(data), ctypes.byref(total)
    )
    if rc != _OK:
        raise InvalidDataError("malformed framed stream")
    arr, out = _out_buffer(total.value + 64)  # sloppy-copy slack
    out_len = ctypes.c_size_t()
    if threads != 1 and hasattr(lib, "stpu_stream_decompress_mt"):
        rc = lib.stpu_stream_decompress_mt(
            data, len(data), out, total.value + 64,
            ctypes.byref(out_len), threads,
        )
    else:
        rc = lib.stpu_stream_decompress(
            data, len(data), out, total.value + 64, ctypes.byref(out_len)
        )
    if rc == _INVALID:
        raise InvalidDataError("corrupt framed stream")
    if rc != _OK:
        raise InvalidDataError(f"native stream decompress failed rc={rc}")
    return arr[: out_len.value].tobytes()
