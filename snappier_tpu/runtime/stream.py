"""Framing-format runtime: batched device codec for framed streams plus
incremental, resumable stream classes.

Parity targets:

* ``SnappyStream`` (SnappyStream.cs) — a ``System.IO.Stream`` adapter
  with sync+async read/write, pooled 8 KiB transfer buffer, Flush
  sealing a chunk, Dispose flushing. Here: :class:`SnappyWriter` /
  :class:`SnappyReader` file-object wrappers (Python IO is sync; the
  async-guard machinery of SnappyStream.cs:611-637 is a .NET-ism with
  no Python equivalent).
* ``SnappyStreamCompressor`` (SnappyStreamCompressor.cs) — 64 KiB
  buffering, header emission, CRC + uncompressed fallback:
  :class:`StreamCompressor`.
* ``SnappyStreamDecompressor`` (SnappyStreamDecompressor.cs) — chunk
  state machine resumable at *any byte boundary* (4-byte scratch for
  split headers/CRCs): :class:`StreamDecompressor` keeps the pending
  tail of the last incomplete chunk, which subsumes the reference's
  scratch-resume bookkeeping.

TPU shape: chunk payloads are independent given boundaries (SURVEY.md
§1), so the hot paths batch chunks into fixed-size device sub-batches
pipelined a few ahead of the ordered fetches (``_pipeline``), with the
framing pipeline fused on device (``frame_batch_packed``) and decode +
CRC + word-packing fused per sub-batch (out_cap = 64 KiB always);
word-packed rows and ragged device-side compaction keep host-link
traffic at the payload's true size.
Decode-side CRC32C of device-decoded chunk bodies runs on the TPU
(``ops.pallas.crc32c.crc32c_blocks`` over the already-materialized
decode outputs — zero host CRC work on the device path, parity with
SnappyStreamDecompressor.cs:117-131 which checksums the decompressed
bytes); host-engine paths and uncompressed chunks use the fastest host
CRC (native slicing-by-8, else the NumPy GF(2) path).
"""

from __future__ import annotations

import functools as _functools

import numpy as np

from snappier_tpu.constants import (
    BLOCK_SIZE,
    CHUNK_COMPRESSED_DATA,
    CHUNK_PADDING,
    CHUNK_STREAM_IDENTIFIER,
    CHUNK_UNCOMPRESSED_DATA,
    MAX_CHUNK_UNCOMPRESSED,
    STREAM_HEADER,
)
from snappier_tpu.errors import InvalidDataError, InvalidOperationError
from snappier_tpu.format.crc32c import crc32c, mask_crc, unmask_crc
from snappier_tpu.format.framing import write_chunk_header
from snappier_tpu.format.varint import read_varint
from snappier_tpu.runtime import block as block_rt
from snappier_tpu.utils.pool import default_pool

#: Static compressed-capacity of the *device batch slot* for one framed
#: chunk's block payload (varint + greedy body <= 3 + 66552). The
#: framing format itself allows compressed payloads up to 16 MiB - 1
#: (3-byte chunk length) as long as the uncompressed size is <= 64 KiB;
#: payloads too large for the device slot are routed through the host
#: block decoder instead of being rejected
#: (SnappyStreamDecompressor.cs imposes no compressed-size cap).
CHUNK_COMP_CAP = BLOCK_SIZE + 2048

#: Reference's default transfer buffer (SnappyStream.cs:16).
DEFAULT_TRANSFER_SIZE = 8192

#: Device sub-batch for the one-shot stream paths: big enough to
#: amortize the ~5 ms dispatch, small enough that several sub-batches
#: pipeline (submit-ahead overlaps host staging with device work).
_SUB_BATCH = 256

#: Sub-batches allowed in flight before the oldest is fetched.
_PIPELINE_DEPTH = 3


def _pow2_batch(b: int) -> int:
    return 1 << max(0, (max(b, 1) - 1)).bit_length()


def _pipeline(submit, fetch, n: int, release=None) -> None:
    """Run ``submit(s)`` for s in range(n), calling ``fetch(*work)`` on
    each result in order while keeping up to ``_PIPELINE_DEPTH``
    sub-batches in flight. JAX dispatch is asynchronous, so the device
    works on earlier batches while the host stages later ones; the
    ordered fetches are the only blocking points.

    ``release(*work)`` is applied to every still-queued sub-batch when
    a submit or fetch raises, so pooled staging buffers held by pending
    work are returned instead of abandoned (round-4 verdict: a decode
    error mid-batch leaked every queued sub-batch's buffer)."""
    from collections import deque

    pending: deque = deque()
    try:
        for s in range(n):
            pending.append(submit(s))
            if len(pending) > _PIPELINE_DEPTH:
                fetch(*pending.popleft())
        while pending:
            fetch(*pending.popleft())
    finally:
        if release is not None:
            while pending:
                release(*pending.popleft())


def _stream_codec():
    """Module-level batched codec for the framing hot paths (cached so
    its jitted graphs compile once per process)."""
    global _CODEC
    if _CODEC is None:
        from snappier_tpu.models.codec import SnappyCodec

        _CODEC = SnappyCodec(with_crc=True)
    return _CODEC


_CODEC = None


def _native_available() -> bool:
    from snappier_tpu.runtime import native

    return native.available()


def _host_crc_fn():
    """Fastest available host-side CRC32C (chunk verification)."""
    from snappier_tpu.runtime import native

    if native.available():
        return native.crc32c
    return crc32c


# ---------------------------------------------------------------------------
# Batched one-shot paths
# ---------------------------------------------------------------------------


def _frame_data_chunk(chunk: bytes, comp: bytes, checksum: bytes) -> bytes:
    if len(comp) < len(chunk):
        return (
            write_chunk_header(CHUNK_COMPRESSED_DATA, 4 + len(comp))
            + checksum
            + comp
        )
    # Incompressibility fallback (SnappyStreamCompressor.cs:213-229).
    return (
        write_chunk_header(CHUNK_UNCOMPRESSED_DATA, 4 + len(chunk))
        + checksum
        + chunk
    )


def _compress_chunks_batched(
    chunks: list[bytes], engine: str = "auto"
) -> list[bytes]:
    """Compress a list of <= 64 KiB chunks (batched on device, or via
    the native host engine); returns full framed data-chunk bytes
    (header + CRC + payload)."""
    from snappier_tpu.runtime.block import _pick_engine

    engine = _pick_engine(engine)
    if engine in ("native", "oracle"):
        if engine == "native":
            from snappier_tpu.runtime import native as eng

            crc_fn = eng.crc32c
        else:
            from snappier_tpu.format import oracle as eng

            crc_fn = crc32c
        out = []
        for c in chunks:
            checksum = mask_crc(crc_fn(c)).to_bytes(4, "little")
            out.append(_frame_data_chunk(c, eng.compress(c), checksum))
        return out
    # Device path: the whole data-chunk pipeline (encode, CRC32C +
    # masking, varint, chunk header, uncompressed fallback) runs in one
    # jitted graph per sub-batch (SnappyCodec.frame_batch_packed).
    # Round-3 shape: fixed-size sub-batches submitted a few ahead of
    # the ordered fetches (JAX dispatch is async, so host staging of
    # batch k+1 overlaps device compute/transfers of batch k), rows
    # word-packed and — when the batch is mostly slack — compacted on
    # device to their true size before crossing the host link.
    codec = _stream_codec()
    results: list[bytes] = [b""] * len(chunks)
    nsub = -(-len(chunks) // _SUB_BATCH)
    sub = _SUB_BATCH if nsub > 1 else _pow2_batch(len(chunks))

    def submit(s: int):
        lo = s * sub
        hi = min(len(chunks), lo + sub)
        frags = default_pool.rent((sub, BLOCK_SIZE), np.uint8)
        try:
            lengths = np.zeros(sub, np.int32)
            for j, c in enumerate(chunks[lo:hi]):
                a = np.frombuffer(c, np.uint8)
                frags[j, : len(a)] = a
                # Zero the tail: the scan kernel's candidate search hashes
                # key windows past `length`, so stale pool bytes would make
                # compressed output nondeterministic (review r3). O(tail),
                # free for full 64 KiB chunks — not a whole-buffer fill.
                frags[j, len(a) :] = 0
                lengths[j] = len(a)
            packed, flens = codec.frame_batch_packed(frags, lengths)
        except BaseException:
            default_pool.giveback(frags)
            raise
        return packed, flens, lo, hi, frags

    def fetch(packed, flens, lo, hi, frags):
        from snappier_tpu.models.codec import compact_words

        try:
            flens_h = np.asarray(flens)
            if (flens_h[: hi - lo] > packed.shape[1] * 4).any():
                raise RuntimeError(
                    "framed chunk exceeds its slot — emission bound "
                    "violated (kernel bug)"
                )
            wlens = (flens_h + 3) >> 2
            total = int(wlens.sum())
            slot_words = packed.shape[0] * packed.shape[1]
            capw = max(1024, 1 << (max(total, 1) - 1).bit_length())
            if capw < slot_words // 2:
                # One device gather re-packs the ragged rows end to end;
                # the [:total] slice fetches the true payload size.
                flat = compact_words(packed, (flens + 3) >> 2, cap_words=capw)
                buf = np.asarray(flat[:total]).view(np.uint8)
                offs = np.concatenate([[0], np.cumsum(wlens)])
                for j in range(hi - lo):
                    o = int(offs[j]) * 4
                    results[lo + j] = buf[o : o + int(flens_h[j])].tobytes()
            else:
                rows = np.asarray(packed).view(np.uint8)
                for j in range(hi - lo):
                    results[lo + j] = rows[j, : int(flens_h[j])].tobytes()
        finally:
            default_pool.giveback(frags)

    def release(packed, flens, lo, hi, frags):
        default_pool.giveback(frags)

    _pipeline(submit, fetch, nsub, release=release)
    return results


def _device_crc_active() -> bool:
    """True when decoded chunk bodies should be checksummed on device
    (the Pallas GF(2) kernel needs a real TPU backend)."""
    import jax

    return jax.default_backend() == "tpu"


@_functools.cache
def _decode_crc_pack_fn(out_cap: int, with_crc: bool):
    """One jitted graph: batched block decode, per-row CRC32C of the
    decoded bytes (SnappyStreamDecompressor.cs:117-131 parity), and
    word-packing of the outputs so the host fetch moves 4x fewer
    bytes. Returns (packed int32 [B, out_cap//4], out_lens, errs,
    crcs)."""
    import jax
    import jax.numpy as jnp

    from snappier_tpu.models.codec import pack_rows

    codec = _stream_codec()

    def fn(comp, comp_lens):
        outs, out_lens, errs = codec.decompress_batch_fn(out_cap)(
            comp, comp_lens
        )
        if with_crc:
            from snappier_tpu.ops.pallas.crc32c import crc32c_blocks

            crcs = crc32c_blocks(outs, out_lens)
        else:
            crcs = jnp.zeros_like(out_lens)
        return pack_rows(outs), out_lens, errs, crcs

    return jax.jit(fn)


def _decompress_chunks_batched(
    payloads: list[bytes], engine: str = "auto"
) -> tuple[list[bytes], list[int]]:
    """Decode a list of compressed data-chunk payloads (block-format
    buffers, each <= 64 KiB uncompressed) in one device batch, or via
    the host engines.

    Returns ``(bodies, crcs)`` — the decoded bytes and the (unmasked)
    CRC32C of each body. On the device engine with a TPU backend the
    CRCs come from one batched on-device GF(2) kernel over the decode
    outputs; host-engine and oversize paths use the host CRC."""
    if not payloads:
        return [], []
    from snappier_tpu.runtime.block import _pick_engine

    engine = _pick_engine(engine)
    host_crc = _host_crc_fn()
    if engine in ("native", "oracle"):
        if engine == "native":
            from snappier_tpu.runtime import native as eng
        else:
            from snappier_tpu.format import oracle as eng
        out = []
        for p in payloads:
            expected, _ = read_varint(p)
            if expected > MAX_CHUNK_UNCOMPRESSED:
                raise InvalidDataError("chunk exceeds 64 KiB uncompressed cap")
            out.append(eng.decompress(p))
        return out, [host_crc(b) for b in out]
    # Spec-legal payloads can be up to 16 MiB compressed as long as the
    # uncompressed size fits the 64 KiB chunk cap; anything too big for
    # the fixed device slot decodes through the host block engine.
    oversize: dict[int, bytes] = {}
    for i, p in enumerate(payloads):
        expected, _ = read_varint(p)
        if expected > MAX_CHUNK_UNCOMPRESSED:
            raise InvalidDataError("chunk exceeds 64 KiB uncompressed cap")
        if len(p) > CHUNK_COMP_CAP - 8:
            oversize[i] = block_rt.decompress(
                p, engine="native" if _native_available() else "oracle"
            )
    device_idx = [i for i in range(len(payloads)) if i not in oversize]
    result: list[bytes] = [b""] * len(payloads)
    crcs: list[int | None] = [None] * len(payloads)
    for i, body in oversize.items():
        result[i] = body
        crcs[i] = host_crc(body)
    if device_idx:
        # Round-3 shape: pipelined sub-batches (see _pipeline), comp
        # slots bucketed to the sub-batch's actual max payload (a 14 KiB
        # html chunk no longer ships in a 66 KiB slot), decode + CRC +
        # word-packing fused in one jitted graph so only packed words
        # cross the host link (4x fewer bytes than byte-per-int32 rows).
        use_crc = _device_crc_active()
        fn = _decode_crc_pack_fn(BLOCK_SIZE, use_crc)
        nsub = -(-len(device_idx) // _SUB_BATCH)
        sub = _SUB_BATCH if nsub > 1 else _pow2_batch(len(device_idx))

        def submit(s: int):
            lo = s * sub
            hi = min(len(device_idx), lo + sub)
            group = device_idx[lo:hi]
            width = max(len(payloads[i]) for i in group)
            width = max(1024, 1 << (max(width, 1) - 1).bit_length())
            width = min(width, CHUNK_COMP_CAP)
            comp = default_pool.rent((sub, width), np.uint8)
            try:
                comp_lens = np.zeros(sub, np.int32)
                for j, i in enumerate(group):
                    a = np.frombuffer(payloads[i], np.uint8)
                    comp[j, : len(a)] = a
                    comp_lens[j] = len(a)
                out = fn(comp, comp_lens)
            except BaseException:
                default_pool.giveback(comp)
                raise
            return (*out, lo, hi, comp)

        def fetch(packed, out_lens, errs, dev_crcs, lo, hi, comp):
            try:
                errs_h = np.asarray(errs)
                out_lens_h = np.asarray(out_lens)
                crcs_h = (
                    np.asarray(dev_crcs).view(np.uint32) if use_crc else None
                )
                rows = np.asarray(packed).view(np.uint8)
                for j in range(hi - lo):
                    i = device_idx[lo + j]
                    block_rt._raise_for_err(int(errs_h[j]))
                    body = rows[j, : int(out_lens_h[j])].tobytes()
                    result[i] = body
                    crcs[i] = (
                        int(crcs_h[j]) if crcs_h is not None else host_crc(body)
                    )
            finally:
                default_pool.giveback(comp)

        def release(packed, out_lens, errs, dev_crcs, lo, hi, comp):
            default_pool.giveback(comp)

        _pipeline(submit, fetch, nsub, release=release)
    return result, crcs  # type: ignore[return-value]


def stream_compress(
    data: bytes, engine: str = "auto", threads: int = 0
) -> bytes:
    """One-shot framing-format compress (batched on device, or entirely
    inside the C++ runtime for the native engine — chunking, CRC and
    headers included, the host IO pipeline). ``threads`` applies to the
    native engine's chunk-parallel pipeline (0 = hardware concurrency,
    1 = serial; output bytes identical at every count)."""
    from snappier_tpu.utils.profiling import timed_call

    data = bytes(data)
    with timed_call("stream.compress", len(data)):
        return _stream_compress_impl(data, engine, threads)


def _stream_compress_impl(data: bytes, engine: str, threads: int) -> bytes:
    from snappier_tpu.runtime.block import _pick_engine

    if _pick_engine(engine) == "native":
        from snappier_tpu.runtime import native

        return native.stream_compress(data, threads=threads)
    chunks = [
        data[i : i + MAX_CHUNK_UNCOMPRESSED]
        for i in range(0, len(data), MAX_CHUNK_UNCOMPRESSED)
    ]
    return b"".join([STREAM_HEADER] + _compress_chunks_batched(chunks, engine))


def stream_decompress(
    data: bytes, engine: str = "auto", threads: int = 0
) -> bytes:
    """One-shot framing-format decompress with full CRC verification.
    ``threads`` as in :func:`stream_compress` (identical verdicts at
    every count)."""
    from snappier_tpu.utils.profiling import timed_call

    data = bytes(data)
    with timed_call("stream.decompress", len(data)):
        return _stream_decompress_impl(data, engine, threads)


def _stream_decompress_impl(data: bytes, engine: str, threads: int) -> bytes:
    from snappier_tpu.runtime.block import _pick_engine

    if _pick_engine(engine) == "native":
        from snappier_tpu.runtime import native

        return native.stream_decompress(data, threads=threads)
    d = StreamDecompressor(engine=engine)
    out = d.decompress(data)
    d.finish()
    return out


# ---------------------------------------------------------------------------
# Incremental state machines
# ---------------------------------------------------------------------------


class StreamCompressor:
    """Incremental framing compressor: buffers input to 64 KiB chunk
    boundaries; ``flush`` seals a partial chunk (each flush creates a
    chunk, matching SnappyStreamCompressor.Flush :82 — tests exploit
    this to create many tiny chunks, SnappyStreamTests.cs:158-192)."""

    def __init__(self, engine: str = "auto") -> None:
        self._buf = bytearray()
        self._header_written = False
        self._engine = engine

    def _header(self) -> bytes:
        if self._header_written:
            return b""
        self._header_written = True
        return STREAM_HEADER

    def write(self, data: bytes) -> bytes:
        """Feed input; returns any framed bytes produced."""
        self._buf += data
        if len(self._buf) < MAX_CHUNK_UNCOMPRESSED:
            return self._header() if not self._header_written else b""
        chunks = []
        while len(self._buf) >= MAX_CHUNK_UNCOMPRESSED:
            chunks.append(bytes(self._buf[:MAX_CHUNK_UNCOMPRESSED]))
            del self._buf[:MAX_CHUNK_UNCOMPRESSED]
        return self._header() + b"".join(
            _compress_chunks_batched(chunks, self._engine)
        )

    def flush(self) -> bytes:
        """Seal the current partial chunk, if any."""
        out = self._header()
        if self._buf:
            chunk = bytes(self._buf)
            self._buf.clear()
            out += _compress_chunks_batched([chunk], self._engine)[0]
        return out


class StreamDecompressor:
    """Incremental framing decompressor, resumable at any byte
    boundary: incomplete chunk bytes stay pending until the next feed
    (subsumes SnappyStreamDecompressor's scratch machinery,
    SnappyStreamDecompressor.cs:11-36, 215-289)."""

    def __init__(self, engine: str = "auto") -> None:
        self._pending = bytearray()
        self._seen_header = False
        self._engine = engine

    def decompress(self, data: bytes) -> bytes:
        """Feed framed bytes; returns decoded bytes available so far."""
        self._pending += data
        payloads: list[bytes] = []  # compressed payloads for batch decode
        order: list[tuple[str, bytes | int]] = []  # assembly plan
        crcs: list[int] = []
        pos = 0
        buf = self._pending
        while True:
            if pos + 4 > len(buf):
                break
            ctype = buf[pos]
            plen = int.from_bytes(buf[pos + 1 : pos + 4], "little")
            if ctype == CHUNK_STREAM_IDENTIFIER and plen != 6:
                raise InvalidDataError("bad stream identifier length")
            # No compressed-size cap here: the 3-byte chunk length field
            # bounds plen at 16 MiB - 1 and the format only caps the
            # *uncompressed* size (checked after the varint preamble is
            # read) — parity with SnappyStreamDecompressor, which
            # accepts any spec-legal payload size.
            if pos + 4 + plen > len(buf):
                break
            payload = bytes(buf[pos + 4 : pos + 4 + plen])
            pos += 4 + plen
            if ctype == CHUNK_STREAM_IDENTIFIER:
                if payload != STREAM_HEADER[4:]:
                    raise InvalidDataError("bad stream identifier payload")
                self._seen_header = True
                continue
            if not self._seen_header:
                raise InvalidDataError("data before stream identifier")
            if ctype == CHUNK_COMPRESSED_DATA:
                if len(payload) < 4:
                    raise InvalidDataError("data chunk shorter than its CRC")
                crcs.append(unmask_crc(int.from_bytes(payload[:4], "little")))
                order.append(("c", len(payloads)))
                payloads.append(payload[4:])
            elif ctype == CHUNK_UNCOMPRESSED_DATA:
                if len(payload) < 4:
                    raise InvalidDataError("data chunk shorter than its CRC")
                body = payload[4:]
                if len(body) > MAX_CHUNK_UNCOMPRESSED:
                    raise InvalidDataError(
                        "chunk exceeds 64 KiB uncompressed cap"
                    )
                expected = unmask_crc(int.from_bytes(payload[:4], "little"))
                if _host_crc_fn()(body) != expected:
                    raise InvalidDataError("chunk CRC32C mismatch")
                order.append(("u", body))
            elif ctype == CHUNK_PADDING or ctype >= 0x80:
                continue
            else:
                raise InvalidDataError(
                    f"unknown unskippable chunk type 0x{ctype:02x}"
                )
        del self._pending[:pos]
        decoded, body_crcs = _decompress_chunks_batched(payloads, self._engine)
        ci = 0
        out = bytearray()
        for kind, v in order:
            if kind == "u":
                out += v  # type: ignore[arg-type]
            else:
                if body_crcs[v] != crcs[ci]:  # type: ignore[index]
                    raise InvalidDataError("chunk CRC32C mismatch")
                ci += 1
                out += decoded[v]  # type: ignore[index]
        return bytes(out)

    def finish(self) -> None:
        """Assert end of stream (no dangling partial chunk)."""
        if self._pending:
            raise InvalidDataError(
                f"{len(self._pending)} trailing bytes of incomplete chunk"
            )


# ---------------------------------------------------------------------------
# File-object adapters (SnappyStream parity)
# ---------------------------------------------------------------------------


class SnappyWriter:
    """Write-mode SnappyStream: wraps a binary file object, writes the
    framing format. Parity: SnappyStream.cs compression mode
    (ctor :55, WriteCore :381, Flush :135, Dispose :486)."""

    def __init__(
        self, inner, leave_open: bool = False, engine: str = "auto"
    ) -> None:
        self._inner = inner
        self._leave_open = leave_open
        self._comp: StreamCompressor | None = StreamCompressor(engine=engine)

    def _check_open(self) -> StreamCompressor:
        if self._comp is None:
            raise InvalidOperationError("stream is closed")
        return self._comp

    def write(self, data: bytes) -> int:
        out = self._check_open().write(bytes(data))
        if out:
            self._inner.write(out)
        return len(data)

    def flush(self) -> None:
        out = self._check_open().flush()
        if out:
            self._inner.write(out)
        if hasattr(self._inner, "flush"):
            self._inner.flush()

    def close(self) -> None:
        if self._comp is None:
            return
        out = self._comp.flush()
        self._comp = None
        if out:
            self._inner.write(out)
        if not self._leave_open:
            self._inner.close()

    def writable(self) -> bool:
        return True

    def readable(self) -> bool:
        return False

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class SnappyReader:
    """Read-mode SnappyStream: wraps a binary file object containing a
    framed stream. Parity: SnappyStream.cs decompression mode
    (ReadCore :194, pooled 8 KiB transfer buffer :16)."""

    def __init__(
        self,
        inner,
        leave_open: bool = False,
        transfer_size: int = DEFAULT_TRANSFER_SIZE,
        engine: str = "auto",
    ) -> None:
        self._inner = inner
        self._leave_open = leave_open
        self._transfer = transfer_size
        self._decomp: StreamDecompressor | None = StreamDecompressor(
            engine=engine
        )
        self._ready = bytearray()
        self._eof = False

    def _check_open(self) -> StreamDecompressor:
        if self._decomp is None:
            raise InvalidOperationError("stream is closed")
        return self._decomp

    def read(self, size: int = -1) -> bytes:
        d = self._check_open()
        while not self._eof and (size < 0 or len(self._ready) < size):
            raw = self._inner.read(self._transfer)
            if not raw:
                self._eof = True
                d.finish()
                break
            self._ready += d.decompress(raw)
        if size < 0:
            out = bytes(self._ready)
            self._ready.clear()
        else:
            out = bytes(self._ready[:size])
            del self._ready[:size]
        return out

    def readall(self) -> bytes:
        return self.read(-1)

    def close(self) -> None:
        if self._decomp is None:
            return
        self._decomp = None
        if not self._leave_open:
            self._inner.close()

    def readable(self) -> bool:
        return True

    def writable(self) -> bool:
        return False

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def SnappyStream(inner, mode: str = "rb", **kw):
    """Convenience factory mirroring the reference's single
    ``SnappyStream`` class (SnappyStream.cs:55 ctor with
    CompressionMode): ``mode='rb'`` returns a :class:`SnappyReader`,
    ``mode='wb'`` a :class:`SnappyWriter`."""
    if mode in ("rb", "r", "read", "decompress"):
        return SnappyReader(inner, **kw)
    if mode in ("wb", "w", "write", "compress"):
        return SnappyWriter(inner, **kw)
    raise ValueError(f"unsupported mode {mode!r}")


# ---------------------------------------------------------------------------
# Async adapters (SnappyStream's async surface)
# ---------------------------------------------------------------------------


class AsyncSnappyWriter:
    """Async twin of :class:`SnappyWriter` (parity: SnappyStream's
    WriteAsync/FlushAsync/DisposeAsync surface, SnappyStream.cs:393,
    :99, :533). Codec work runs in a worker thread via
    ``asyncio.to_thread``; like the reference's single-async-operation
    guard (SnappyStream.cs:611-637), concurrent operations on one
    stream are serialized with an internal lock."""

    def __init__(self, inner, leave_open: bool = False, engine: str = "auto"):
        import asyncio

        self._w = SnappyWriter(inner, leave_open=leave_open, engine=engine)
        self._lock = asyncio.Lock()

    async def write(self, data: bytes) -> int:
        import asyncio

        async with self._lock:
            return await asyncio.to_thread(self._w.write, data)

    async def flush(self) -> None:
        import asyncio

        async with self._lock:
            await asyncio.to_thread(self._w.flush)

    async def close(self) -> None:
        import asyncio

        async with self._lock:
            await asyncio.to_thread(self._w.close)

    async def __aenter__(self):
        return self

    async def __aexit__(self, *exc):
        await self.close()


class AsyncSnappyReader:
    """Async twin of :class:`SnappyReader` (ReadAsync surface,
    SnappyStream.cs:235-346)."""

    def __init__(self, inner, **kw):
        import asyncio

        self._r = SnappyReader(inner, **kw)
        self._lock = asyncio.Lock()

    async def read(self, size: int = -1) -> bytes:
        import asyncio

        async with self._lock:
            return await asyncio.to_thread(self._r.read, size)

    async def close(self) -> None:
        import asyncio

        async with self._lock:
            await asyncio.to_thread(self._r.close)

    async def __aenter__(self):
        return self

    async def __aexit__(self, *exc):
        await self.close()
