"""Snappy block codec on the TPU scalar core (Pallas + SMEM).

Why this shape: the wire format is a byte-serial tag chain; on real
v5e hardware XLA's gather/scatter run at ~135M elem/s, so the log-step
parallel-scan codec in :mod:`snappier_tpu.ops` spends ~50 small
passes x ~0.5 ms on a 64 KiB block (~30-45 ms). The TPU's *scalar*
unit, working out of SMEM, walks the same chain at tens of cycles per
tag — two orders of magnitude less work for the serial part — while
blocks batch across the Pallas grid and the vector/MXU units remain
free for CRC and future fused pipelines. This mirrors the reference's
split between tag bookkeeping and bulk copies
(SnappyDecompressor.cs:184-347 / CopyHelpers.cs), re-hosted on the
TPU's scalar+DMA machinery.

Layout (round 3): one grid program per block. BYTE-ADDRESSED reads come
from KEY images — one int32 per byte holding the unaligned 32-bit LE
window at that byte, built by one XLA elementwise pass — so every tag
parse, candidate probe, and literal-payload read is a single SMEM load
(the image pre-funnels all four alignments). WORD-PACKED images (4 LE
bytes per int32) carry everything written incrementally: the decoder's
output (copy sources reference it, streamed through funnel shifts) and
the encoder's emission image (tag RMW merges + pre-funneled payload
words), quartering the output DMA. Measured findings that shaped the
kernels are recorded in docs/ARCHITECTURE.md and docs/ROADMAP.md
(including the negative results: conditional probes serialize; the
decode walk is serial-dependency-bound).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from snappier_tpu.constants import BLOCK_SIZE, MAX_SHORT_LITERAL
from snappier_tpu.ops.decode import (
    ERR_BAD_OFFSET,
    ERR_BAD_PREAMBLE,
    ERR_LENGTH_MISMATCH,
    ERR_TRUNCATED_TAG,
)

_UNROLL = 8

#: Poison value for >31-bit wire fields: large enough to trip the
#: normal bounds checks, small enough never to overflow int32.
_POISON = 1 << 28

#: The walk classifies all mid-stream failures with one combined code
#: (truncated tag / bad offset / length overrun) — computing distinct
#: codes cost ~5 ops per tag for message precision no caller needs
#: (the host raises InvalidDataError either way, listing the matched
#: bits of this mask).
_ERR_MALFORMED = ERR_TRUNCATED_TAG | ERR_BAD_OFFSET | ERR_LENGTH_MISMATCH


@functools.cache
def _tag_lut():
    """256-entry tag descriptor table — the TPU incarnation of the
    reference's CharTable (Constants.cs:29-76). Per tag byte:
    bits 0-2 header length, bit 3 is-literal, bits 4-10 inline length,
    bits 11-13 literal extra-length bytes, bits 14-24 copy-1 offset
    high bits, bits 25-26 tag type. One SMEM load replaces the
    branch/select dispatch tree (measured ~2x on the walk). Cached as
    NumPy (jnp under jit would capture tracers)."""
    import numpy as _np

    lut = _np.zeros(256, _np.int32)
    for t in range(256):
        tt = t & 3
        l6 = t >> 2
        if tt == 0:
            if l6 < 60:
                hdr, L, extra = 1, l6 + 1, 0
            else:
                extra = l6 - 59
                hdr, L = 1 + extra, 0
            is_lit, offhi = 1, 0
        elif tt == 1:
            hdr, L, extra, is_lit, offhi = 2, ((t >> 2) & 7) + 4, 0, 0, (t >> 5) << 8
        elif tt == 2:
            hdr, L, extra, is_lit, offhi = 3, l6 + 1, 0, 0, 0
        else:
            hdr, L, extra, is_lit, offhi = 5, l6 + 1, 0, 0, 0
        lut[t] = (
            hdr | (is_lit << 3) | (L << 4) | (extra << 11) | (offhi << 14)
            | (tt << 25)
        )
    return lut


@functools.cache
def _tag_luts():
    """Round-4 descriptor tables: three parallel 256-entry arrays that
    turn per-tag field unpacking into straight-line arithmetic
    (replaces the round-2 single-LUT + where-chain form; -12 ops/tag):

      d:  bits 0-2 header length, bits 4-10 length base, bits 14-24
          copy-1 offset high bits, bit 31 (the SIGN bit) is-literal —
          the round-4 classifier is one `d < 0` compare instead of
          mask + compare.
      lm: mask over the 4 bytes after the tag contributing to length
          (long literals; 0 elsewhere) — length = (rest & lm) + Lbase.
          The 4-extra-byte literal's mask is the FULL word: the walk's
          unsigned (length - 1) >= remaining compare rejects any value
          a nonzero 4th byte can produce — >= 2^24 as unsigned (larger
          than every SMEM-legal out_cap), negative after the int32
          wrap, or the 0xFFFFFFFF field whose rest + 1 wraps to
          length 0 (the -1 bias maps it to unsigned max; every legal
          tag has length >= 1). Replaces the round-3 explicit poison
          (-4 ops/tag).
      om: mask over those bytes contributing to offset (copies) —
          offset = (rest & om) | offhi. Copy-4's mask is the FULL word:
          a nonzero 4th offset byte makes `off` either negative
          (byte >= 0x80) or >= 2^24 > any legal op, so the walk's
          existing `off <= 0 | off > op` checks reject it with no
          dedicated wide-tag handling (round-3 trim: the parse reads
          the key image at ip+1 — bytes ip+1..ip+4 in ONE load —
          instead of `v32 >> 8` plus a separate byte-4 load).

    Cached as NumPy (jnp under jit would capture tracers)."""
    import numpy as _np

    d = _np.zeros(256, _np.int64)
    lm = _np.zeros(256, _np.int64)
    om = _np.zeros(256, _np.int64)
    for t in range(256):
        tt = t & 3
        l6 = t >> 2
        if tt == 0:
            is_lit, offhi = 1, 0
            if l6 < 60:
                hdr, base = 1, l6 + 1
            else:
                extra = l6 - 59
                hdr, base = 1 + extra, 1
                lm[t] = ((1 << (8 * extra)) - 1) if extra < 4 else -1
        elif tt == 1:
            hdr, base, is_lit, offhi = 2, ((t >> 2) & 7) + 4, 0, (t >> 5) << 8
            om[t] = 0xFF
        elif tt == 2:
            hdr, base, is_lit, offhi = 3, l6 + 1, 0, 0
            om[t] = 0xFFFF
        else:
            hdr, base, is_lit, offhi = 5, l6 + 1, 0, 0
            om[t] = -1  # full 4-byte offset (see docstring)
        d[t] = hdr | (base << 4) | (offhi << 14) | (is_lit << 31)

    def to32(a):
        return ((a + (1 << 31)) % (1 << 32) - (1 << 31)).astype(_np.int32)

    return to32(d), to32(lm), to32(om)


#: Bad-tag instruction-pointer sentinel: far above any legal n (inputs
#: are SMEM-bounded), far below int32 overflow even after adding a
#: garbage advance. A failed tag parks ip here so the walk's loop
#: condition stays the single compare `ip < n` and the error word is
#: reconstructed after the loop (clean termination lands ip exactly on
#: n; see _decode_kernel).
_IP_SENTINEL = 1 << 28


def _decode_kernel(keys_ref, lut_ref, lm_ref, om_ref, lens_ref, out_ref,
                   outlen_ref, err_ref, key_smem, ow_smem,
                   sem_in, sem_out, *, cc, out_cap, unroll=2):
    """Key-image decode walk (round-3 ablation winner; round-4
    software-pipelined).

    The compressed stream ships as a KEY image — one int32 per byte
    holding the unaligned 32-bit little-endian window at that byte
    (built by one XLA elementwise pass, same shape the encoder already
    uses). Every tag parse and every literal-payload source read is
    then ONE SMEM load instead of a two-load funnel-shift merge: the
    image pre-funnels all four alignments. 4x the input DMA (~1% of
    block time) buys ~10 ops off every tag. The output stays a packed
    word image (4 bytes per int32): copy sources reference the output
    itself, which is written incrementally, so copies still stream
    through funnel shifts. The partial frontier word is always stored
    with a garbage tail (bytes >= the frontier are never read and are
    overwritten by the next tag), so there is no carry register.

    Round-4 walk restructure (tools/perf_probe_r4.py, measured on chip
    87.3 -> 82.5 ns/tag):

    * Software pipelining: the NEXT tag's five loads (descriptor LUTs +
      two key-image words) issue as soon as the current tag's advance
      is known, BEFORE its payload stores, so their latency hides under
      store work; the loop carries the preloaded values.
    * The error word is folded into ip (_IP_SENTINEL), the is-literal
      bit into d's sign, and the 4-extra-byte-literal poison into one
      unsigned length-vs-remaining compare (see _tag_luts) — together
      ~6 ops off the per-tag chain.
    * ``unroll=2`` tags per loop backedge (u3/u4 plateau, measured);
      the second slot self-neutralizes when the first ends the stream.
    """
    b = pl.program_id(0)
    kc = key_smem.shape[0]
    owc = ow_smem.shape[0]  # DMA-tiled: out_cap bytes + >=1 KiB slack
    n = lens_ref[b]

    # Images ride flat in HBM; rows are aligned to 1024 words so
    # dynamic 1-D slices stay tile-aligned for the DMA engine.
    cp_in = pltpu.make_async_copy(
        keys_ref.at[pl.ds(b * kc, kc)], key_smem, sem_in
    )
    cp_in.start()
    cp_in.wait()

    def rd(i):
        return key_smem[jnp.clip(i, 0, cc - 1)] & 0xFF

    # --- varint preamble (VarIntEncoding.Read.cs semantics) -------------
    def var_body(state):
        i, val, done, err = state
        byte = rd(i)
        val = val | ((byte & 0x7F) << jnp.minimum(7 * i, 28))
        done = byte < 0x80
        err = jnp.where((i == 4) & (byte >= 8), ERR_BAD_PREAMBLE, err)
        return i + 1, val, done, err

    def var_cond(state):
        i, val, done, err = state
        return (~done) & (i < 5) & (err == 0)

    pre_len, expected, done, err = jax.lax.while_loop(
        var_cond, var_body, (jnp.int32(0), jnp.int32(0), False, jnp.int32(0))
    )
    err = jnp.where(~done, ERR_BAD_PREAMBLE, err)
    err = jnp.where(pre_len > n, ERR_BAD_PREAMBLE, err)
    # Reject against the caller's logical capacity, not the DMA-rounded
    # SMEM size `oc` (up to ~3 KiB larger) — otherwise a block claiming
    # expected in (out_cap, oc] decodes "cleanly" but is silently
    # truncated when the host slices the result to out_cap.
    err = jnp.where(expected > out_cap, ERR_BAD_PREAMBLE, err)
    err = jnp.where(expected < 0, ERR_BAD_PREAMBLE, err)

    # --- copy machinery ----------------------------------------------------
    def funnel(lo, hi, a8, hs2):
        # (hi << 1) << hs2 with hs2 = 31 - a8 shifts hi up by 32 - a8
        # without the undefined shift-by-32 lane a8 == 0 would need.
        return jax.lax.shift_right_logical(lo, a8) | ((hi << 1) << hs2)

    def append_lit(spos, op, K):
        """Append K literal bytes from the key image to the output
        frontier op. The key image pre-funnels every alignment, so each
        output word is ONE load: ow[w] = key(src byte for w's lane 0).
        Over-stores whole words past the frontier (bytes >= op + K are
        garbage until a later tag overwrites them — never read); key
        overreads land in the image's >= 1 KiB top slack. The first
        store pair is UNCONDITIONAL (round 4: the nw > 0 branch cost
        ~2 ns/tag more than the two over-stores it saved; copies never
        read above the frontier, so the garbage-tail contract already
        licenses the stores)."""
        w0 = op >> 2
        da8 = (op & 3) * 8
        lowmask = (1 << da8) - 1
        ow_smem[w0] = (ow_smem[w0] & lowmask) | (key_smem[spos] << da8)
        s1 = spos + 4 - (op & 3)
        nw = ((op + K - 1) >> 2) - w0  # full/partial words after w0

        ow_smem[w0 + 1] = key_smem[s1]
        ow_smem[w0 + 2] = key_smem[s1 + 4]

        @pl.when(nw > 2)
        def _():
            ow_smem[w0 + 3] = key_smem[s1 + 8]
            ow_smem[w0 + 4] = key_smem[s1 + 12]

            @pl.when(nw > 4)
            def _():
                def cp(k, _):
                    w = w0 + 5 + 4 * k
                    s = s1 + 16 + 16 * k
                    ow_smem[w] = key_smem[s]
                    ow_smem[w + 1] = key_smem[s + 4]
                    ow_smem[w + 2] = key_smem[s + 8]
                    ow_smem[w + 3] = key_smem[s + 12]
                    return 0

                jax.lax.fori_loop(0, (nw - 1) >> 2, cp, 0,
                                  unroll=False)

    def append_stream(spos, op, K):
        """Append K bytes read from the packed output image at byte
        spos to the output frontier op (copy path; off >= 8 keeps the
        stream reads behind the written words). Over-stores whole words
        past the frontier (bytes >= op + K are garbage until a later
        tag overwrites them — never read)."""
        rel = spos - op
        a8 = (rel & 3) * 8
        rw = rel >> 2  # arithmetic shift: floor for negative rel
        hs2 = 31 - a8
        w0 = op >> 2
        da8 = (op & 3) * 8
        lowmask = (1 << da8) - 1

        # Unclipped stream reads (measured ~10 ops/tag of clips): every
        # tag passes its bounds checks before appending, so all USED
        # source words are in range; the sloppy overreads past the last
        # needed word land in the output image's >= 256-word top slack.
        # The only possible negative index is `base` itself (when
        # spos < 4 and spos % 4 < op % 4 floor rw to -1 too far): its
        # bytes feed only destination positions below the frontier,
        # which the w0 read-modify-write masks away — so a single max()
        # clamp on that one read suffices.
        def sw(i):
            return ow_smem[i]

        base = w0 + rw
        prev = sw(jnp.maximum(base, 0))
        nxt = sw(base + 1)
        sv = funnel(prev, nxt, a8, hs2)
        ow_smem[w0] = (ow_smem[w0] & lowmask) | (sv & ~lowmask)
        nw = ((op + K - 1) >> 2) - w0  # full/partial words after w0

        # First pair UNCONDITIONAL (round 4, see append_lit): the
        # source reads sit >= 2 words behind the frontier for every
        # legal off >= 8 (base + 3 <= w0 + 1), so even a pure
        # over-store reads only written or garbage-region words.
        n2 = sw(base + 2)
        ow_smem[w0 + 1] = funnel(nxt, n2, a8, hs2)
        n3 = sw(base + 3)
        ow_smem[w0 + 2] = funnel(n2, n3, a8, hs2)

        @pl.when(nw > 2)
        def _():
            # Second unrolled pair covers nw <= 4 (tags to ~17
            # bytes) before falling into the fori: entering a
            # data-dependent inner loop costs ~20 ns (cliff probe,
            # docs/ROADMAP.md) so it is reserved for long copies.
            n4 = sw(base + 4)
            ow_smem[w0 + 3] = funnel(n3, n4, a8, hs2)
            n5 = sw(base + 5)
            ow_smem[w0 + 4] = funnel(n4, n5, a8, hs2)

            @pl.when(nw > 4)
            def _():
                # 4 words per iteration: giant literals
                # (incompressible blocks) run thousands of
                # iterations, so the loop-share per byte matters
                # more than the <= 3-word over-store.
                def cp(k, carry):
                    w = w0 + 5 + 4 * k
                    m1 = sw(w + rw + 1)
                    ow_smem[w] = funnel(carry, m1, a8, hs2)
                    m2 = sw(w + rw + 2)
                    ow_smem[w + 1] = funnel(m1, m2, a8, hs2)
                    m3 = sw(w + rw + 3)
                    ow_smem[w + 2] = funnel(m2, m3, a8, hs2)
                    m4 = sw(w + rw + 4)
                    ow_smem[w + 3] = funnel(m3, m4, a8, hs2)
                    return m4

                jax.lax.fori_loop(0, (nw - 1) >> 2, cp, n5,
                                  unroll=False)

    def append_bytes(spos, op, K):
        """Byte-serial append via read-modify-write (off < 8 prefix)."""

        def cpb(k, _):
            q = op + k
            s = spos + k
            byte = jax.lax.shift_right_logical(
                ow_smem[s >> 2], (s & 3) * 8
            ) & 0xFF
            sh = (q & 3) * 8
            w = q >> 2
            ow_smem[w] = (ow_smem[w] & ~(0xFF << sh)) | (byte << sh)
            return 0

        jax.lax.fori_loop(0, K, cpb, 0, unroll=False)

    # --- tag walk (software-pipelined, see module docstring) -------------
    guard = cc - 1  # clamp for the speculative next-tag preload

    def load_tag(i):
        w = key_smem[i]
        tag = w & 0xFF
        # The pre-funneled window at i+1 IS bytes [i+1, i+5) — the
        # whole extra-byte field of every tag in one load (round-3
        # trim: replaces `v32 >> 8` + a separate byte-4 load).
        return lut_ref[tag], lm_ref[tag], om_ref[tag], key_smem[i + 1]

    def one_tag(st):
        """Process the tag whose preloaded descriptors ride in st;
        return the next state with the NEXT tag already preloaded."""
        ip, op, d, lm, om, rest = st
        hdr = d & 7
        is_lit = d < 0
        # Straight-line field extraction via the three parallel LUTs
        # (_tag_luts): length = masked extra bytes + base; offset =
        # masked extra bytes | copy-1 high bits. Copy-4 reads its full
        # 4-byte offset (om = -1): an out-of-range value fails the
        # off-bounds check naturally.
        length = (rest & lm) + ((d >> 4) & 0x7F)
        off = (rest & om) | ((d >> 14) & 0x7FF)
        advance = hdr + jnp.where(is_lit, length, 0)
        ip2 = ip + advance
        # Speculative preload of the NEXT tag before this tag's payload
        # stores: the five loads' latency hides under the store work.
        # ip2 can be garbage (bad tag) — the clip only protects the
        # loads; validity is re-established below.
        d2, lm2, om2, rest2 = load_tag(jnp.clip(ip2, 0, guard))

        # Bounds. The unsigned compare (length - 1) >=u (expected - op)
        # folds four checks into one: length > remaining output, length
        # negative (wraps to huge), the 4-extra-byte literal with a
        # nonzero 4th byte (>= 2^24 unsigned, > any SMEM-legal out_cap
        # — see _tag_luts), and the length-field-0xFFFFFFFF literal
        # whose `rest + 1` wraps int32 to length 0 (length - 1 is then
        # 0xFFFFFFFF unsigned; every legal tag has length >= 1, so the
        # -1 bias rejects exactly the wrap). expected - op >= 0 is a
        # loop invariant, so the unsigned view of the remainder is
        # exact. This must come before trusting ip2: a literal length
        # near 2^31 can wrap ip + advance negative, sliding past
        # `ip2 > n` — the length check rejects those first.
        bad = (ip2 > n) | (
            (length - 1).astype(jnp.uint32)
            >= (expected - op).astype(jnp.uint32)
        )
        bad = bad | (~is_lit & ((off <= 0) | (off > op)))
        ok = (~bad) & (ip < n)

        @pl.when(ok & is_lit)
        def _():
            append_lit(ip + hdr, op, length)

        # Round-5 ablation (REJECTED, tools/perf_r5 A/B on chip): a
        # word-aligned (off % 4 == 0) no-funnel copy fast path measured
        # 432.1 vs 400.5 us/block — the per-copy alignment branch and
        # the duplicated pl.when body cost more than the funnel
        # arithmetic they remove (same class as r4's pipe2unc2).
        @pl.when(ok & ~is_lit & (off >= 8))
        def _():
            append_stream(op - off, op, length)

        @pl.when(ok & ~is_lit & (off < 8))
        def _():
            # Pattern expansion (CopyHelpers.IncrementalCopy analog):
            # byte-serial first min(K, 14), after which a multiple of
            # the period >= 8 exists and the funnel path finishes.
            head = jnp.minimum(length, 14)
            append_bytes(op - off, op, head)

            @pl.when(length > 14)
            def _():
                off2 = off * (14 // jnp.maximum(off, 1))
                append_stream(op + 14 - off2, op + 14, length - 14)

        ip3 = jnp.where(bad, _IP_SENTINEL, ip2)
        # Unrolled-slot neutralization: once a prior slot ends the
        # stream (clean ip == n or sentinel), later slots in the same
        # backedge must not move.
        ip3 = jnp.where(ip >= n, ip, ip3)
        op3 = jnp.where(ok, op + length, op)
        return ip3, op3, d2, lm2, om2, rest2

    def tag_cond(st):
        return st[0] < n

    def tag_body(st):
        for _ in range(unroll):
            st = one_tag(st)
        return st

    ip0 = jnp.where(err == 0, pre_len, jnp.int32(_IP_SENTINEL))
    d0, lm0, om0, rest0 = load_tag(jnp.clip(ip0, 0, guard))
    ip, op, _, _, _, _ = jax.lax.while_loop(
        tag_cond, tag_body, (ip0, jnp.int32(0), d0, lm0, om0, rest0)
    )
    walk_err = jnp.where(ip != n, _ERR_MALFORMED, 0)
    walk_err = jnp.where(
        (walk_err == 0) & (op != expected), ERR_LENGTH_MISMATCH, walk_err
    )
    err = jnp.where(err != 0, err, walk_err)

    outlen_ref[b] = jnp.where(err == 0, expected, 0)
    err_ref[b] = err

    cp_out = pltpu.make_async_copy(
        ow_smem, out_ref.at[pl.ds(b * owc, owc)], sem_out
    )
    cp_out.start()
    cp_out.wait()


def _interpret_default() -> bool:
    # Interpreter mode lets the same kernels run in hermetic CPU tests.
    return jax.default_backend() != "tpu"


def _core_parallel_default() -> bool:
    """SNAPPIER_CORE_PARALLEL=1 marks the block grid ``core_parallel``
    so Mosaic splits it across a chip's TensorCores (2x on v5p-class
    megacore parts). Blocks are independent and every per-core state
    (SMEM scratch, the encoder's epoch-tagged table) is core-local, so
    the split is semantically free; default OFF because this repo's
    1-TensorCore v5e rejects the semantic at compile time (the flag is
    for multi-core deployments — docs/PERF_BUDGET.md path 2)."""
    import os

    return os.environ.get("SNAPPIER_CORE_PARALLEL", "") == "1"


def _compiler_params(core_parallel: bool):
    if core_parallel:
        return pltpu.CompilerParams(
            has_side_effects=True, dimension_semantics=("core_parallel",)
        )
    return pltpu.CompilerParams(has_side_effects=True)


@functools.partial(
    jax.jit,
    static_argnames=(
        "out_cap", "interpret", "packed", "core_parallel", "unroll"
    ),
)
def decode_blocks_scalar(
    comp, comp_lens, out_cap: int = BLOCK_SIZE, interpret: bool | None = None,
    packed: bool = False, core_parallel: bool | None = None, unroll: int = 2,
):
    """Decode a batch of Snappy blocks on the TPU scalar core.

    Args:
      comp: int32[B, CC] compressed blocks (varint + tags), zero-padded.
      comp_lens: int32[B].
      out_cap: static output capacity per block.
      interpret: run in the Pallas interpreter (defaults to True off-TPU).
      packed: return word-packed rows int32[B, out_cap//4] (4 LE bytes
        per int32) instead of byte-per-int32 — 4x fewer bytes over the
        host link; view as uint8 host-side.
      unroll: tags decoded per walk backedge (2 measured best on v5e,
        tools/perf_probe_r4.py; 3/4 plateau).

    Returns: (out int32[B, out_cap], out_lens int32[B], errs int32[B]),
    or with ``packed`` (out int32[B, out_cap//4], out_lens, errs).
    """
    if interpret is None:
        interpret = _interpret_default()
    if core_parallel is None:
        core_parallel = _core_parallel_default()
    comp = comp.astype(jnp.int32)
    B, CC = comp.shape
    assert CC % 1024 == 0 and out_cap % 1024 == 0  # 1-D DMA tiling
    assert unroll >= 1  # unroll=0 would make the walk body the identity
    # Key image of the compressed bytes: one int32 per byte holding the
    # unaligned 32-bit LE window at that byte (XLA elementwise pass).
    # 4x the DMA of the round-2 packed-word image (~1% of block time)
    # but every tag parse / literal source read becomes ONE SMEM load —
    # the image pre-funnels all four alignments. 1 KiB of zero slack
    # absorbs the walk's sloppy overreads.
    keys = _keys_from_frags(comp)[:, : CC + 1024]
    kc = CC + 1024
    owc = -(-(out_cap + 1024) // 4 // 1024) * 1024  # words, DMA-tiled
    kern = functools.partial(
        _decode_kernel, cc=CC, out_cap=out_cap, unroll=unroll
    )
    ow_flat, out_lens, errs = pl.pallas_call(
        kern,
        grid=(B,),
        out_shape=(
            jax.ShapeDtypeStruct((B * owc,), jnp.int32),
            jax.ShapeDtypeStruct((B,), jnp.int32),
            jax.ShapeDtypeStruct((B,), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.SMEM((kc,), jnp.int32),  # key image incl. 1 KiB slack
            pltpu.SMEM((owc,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=_compiler_params(core_parallel),
        interpret=interpret,
    )(
        keys.reshape(-1),
        *(jnp.asarray(a) for a in _tag_luts()),
        comp_lens.astype(jnp.int32),
    )
    ow = ow_flat.reshape(B, owc)
    if packed:
        # Word-packed rows (4 LE bytes per int32, out_cap//4 words):
        # callers that ship results to the host fetch 4x fewer bytes
        # and .view(np.uint8) there (round-3 tunnel-transfer fix).
        return ow[:, : out_cap // 4], out_lens, errs
    # Unpack words back to the byte-per-int32 API contract (cheap XLA
    # elementwise; stays on device).
    sh = jnp.arange(4, dtype=jnp.int32) * 8
    by = (
        jax.lax.shift_right_logical(ow[:, :, None], sh[None, None, :]) & 0xFF
    ).reshape(B, owc * 4)
    return by[:, :out_cap], out_lens, errs


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

#: 15 bits (32K entries, 128 KiB SMEM): A/B on chip vs 14 was
#: time-neutral with ratio 0.2202 -> 0.2192 on html; 16 bits would
#: push the kernel past the 1 MiB SMEM budget. (The reference caps at
#: 14, HashTable.cs:14-18 — its tables live in L1/L2.)
_HASH_BITS = 15
_HASH_MUL = 0x1E35A7BD  # HashTable.cs magic-multiply form
# Epoch-tag capacity of the encoder's match table: 15 bits of grid rank
# (entry = ((b & 0x7FFF)+1) << 16 | pos). Batches larger than this are
# split host-side — see the guard in encode_blocks_scalar.
_EPOCH_BLOCKS = 1 << 15


def _match_extension(key, at, cand, n, seed=None):
    """Match-extension walk: given a verified 4-byte seed match
    (``key(at) == key(cand)``, the caller's probe check), return the
    full match length ``m`` in [4, n - at] — a stride-8 loop comparing
    two 4-byte groups per backedge (FindMatchLength shape,
    SnappyCompressor.cs:562-688) followed by a branchless <= 3-byte
    tail from the XOR of the next 4-byte groups (the trailing-zero-byte
    count of the XOR is the extra match length; replaces a byte-compare
    while loop).

    Round-4 restructure (tools/perf_probe_r4.py encext8u, +3.5% encode
    on chip): the advance is an UNCONDITIONAL m += 8 — the compares
    feed only the loop condition, keeping per-iteration latency equal
    to the old stride-4 walk while halving backedge/branch resolutions
    (a data-dependent advance was measured to give the halving back in
    chained latency). The exit backs up from the carried eq bits; a
    bounds exit finishes with at most one stride-4 group. Returns the
    same exact maximal length as the stride-4 walk for every input.

    ``seed(pos)`` is called once per stride-8 step (fast mode's
    hash-table seeding, ~2.4 entries per average match — still denser
    than the reference's 2 per match; the measured cost of the halved
    density is +0.04-0.64% compressed size on html, inside the
    <= -reference envelope, and a restored-density two-seed variant
    measured WORSE — eviction noise, see docs/ROADMAP.md). None in
    best mode and in the test probe, whose outputs are therefore
    unchanged. Validated against the reference's FindMatchLength
    golden-vector table (SnappyCompressorTests.cs:10-96) via
    match_extension_probe."""
    def ext_body(st):
        m, _, _ = st
        if seed is not None:
            seed(at + m)
        eq0 = key(at + m) == key(cand + m)
        eq1 = key(at + m + 4) == key(cand + m + 4)
        return m + 8, eq0 & eq1, eq0

    def ext_cond(st):
        m, go, _ = st
        return go & (at + m + 8 <= n)

    # Round-5 inline warmup: the first stride-8 group runs as
    # straight-line code, so the while_loop is entered only for
    # matches that extend past 12 bytes — every hit saves one backedge
    # (~15 cycles) and short matches skip the data-dependent loop
    # entry entirely (~20 ns cliff, docs/PERF_BUDGET.md). The
    # constructed start state is exactly the original loop's state
    # after its first iteration (or its untouched initial state when
    # the bounds exit fires before iteration 1), so returned lengths
    # and seed positions are bit-identical to the pre-r5 walk.
    has12 = at + 12 <= n
    if seed is not None:
        @pl.when(has12)
        def _():
            seed(at + 4)

    eq0w = key(at + 4) == key(cand + 4)  # overreads land in key slack
    eq1w = key(at + 8) == key(cand + 8)
    m0 = jnp.where(has12, 12, 4)
    go0 = jnp.where(has12, eq0w & eq1w, True)
    eq0l0 = jnp.where(has12, eq0w, True)
    m, go, eq0l = jax.lax.while_loop(ext_cond, ext_body, (m0, go0, eq0l0))
    # Mismatch exit: back up to the first failing group (the carried
    # eq0 says which of the pair failed). Bounds exit: at most one
    # stride-4 group remains before the tail.
    m = jnp.where(go, m, m - 8 + jnp.where(eq0l, 4, 0))
    can4 = go & (at + m + 4 <= n) & (key(at + m) == key(cand + m))
    m = m + jnp.where(can4, 4, 0)

    x = key(at + m) ^ key(cand + m)
    t0 = jnp.where((x & 0xFF) == 0, 1, 0)
    t1 = jnp.where((x & 0xFFFF) == 0, 1, 0)
    t2 = jnp.where((x & 0xFFFFFF) == 0, 1, 0)
    m = m + jnp.where(x == 0, 3, t0 + t1 + t2)
    return jnp.minimum(m, n - at)


def _probe_kernel(keys_ref, args_ref, out_ref, key_smem, sem_in, *, cc):
    """Grid-free test-hook kernel: one _match_extension call per row."""
    b = pl.program_id(0)
    kc = key_smem.shape[0]
    cp_in = pltpu.make_async_copy(
        keys_ref.at[pl.ds(b * kc, kc)], key_smem, sem_in
    )
    cp_in.start()
    cp_in.wait()

    def key(i):
        return key_smem[i]

    out_ref[b] = _match_extension(
        key, args_ref[b, 0], args_ref[b, 1], args_ref[b, 2]
    )


def match_extension_probe(bufs, ats, cands, ns, interpret: bool | None = None):
    """TEST HOOK: run the production extension walk on byte buffers.

    Args:
      bufs: int32[B, CC] byte rows (CC a multiple of 1024).
      ats, cands, ns: int32[B] — match position, candidate position,
        and buffer length per row. Precondition (as in the production
        probe): the 4 bytes at ``ats`` and ``cands`` are equal.

    Returns int32[B] full match lengths. This is the reference's
    internal-test-hook pattern (InternalsVisibleTo + hooks,
    SnappyDecompressor.cs:686-718) re-expressed for a Pallas kernel:
    the golden-vector suite exercises the exact production loop, not a
    reimplementation.
    """
    if interpret is None:
        interpret = _interpret_default()
    bufs = bufs.astype(jnp.int32)
    B, CC = bufs.shape
    assert CC % 1024 == 0
    keys = _keys_from_frags(bufs)[:, : CC + 1024]
    args = jnp.stack(
        [jnp.asarray(a, jnp.int32) for a in (ats, cands, ns)], axis=1
    )
    kern = functools.partial(_probe_kernel, cc=CC)
    return pl.pallas_call(
        kern,
        grid=(B,),
        out_shape=jax.ShapeDtypeStruct((B,), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.SMEM((CC + 1024,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(keys.reshape(-1), args)


def _encode_kernel(keys_ref, hashes_ref, lens_ref, out_ref, outlen_ref,
                   key_smem, hash_smem, out_smem, table_smem, sem_in,
                   sem_hash, sem_out, *, hash_bits=_HASH_BITS, skip_base=32,
                   exact_cands=False):
    # With exact_cands (level="best"), hashes_ref/hash_smem carry the
    # VPU-precomputed widest-first nearest-match candidate per position
    # (ops.best_match.exact_candidates) instead of hashes; the walk
    # verifies each candidate's first 4 bytes exactly and measures the
    # true extension, so fingerprint collisions cannot corrupt output.
    # table_smem is a dummy in that mode (no hash table at all).
    b = pl.program_id(0)
    fc = key_smem.shape[0]  # padded: fragment + 1024 slack (overreads)
    # Output image: WORD-PACKED (4 LE bytes per int32), sized
    # (fragment + 2048)/4 words rounded up to the 1024-word DMA tiling.
    # Greedy emission is provably <= n + n//65 + 8 bytes
    # (constants.greedy_emit_bound: copies never expand, literal runs
    # add <= 1 byte per 65 covered), i.e. 66552 for a full fragment —
    # so even with the sloppy word spills every store lands well inside
    # the image and the unclipped payload loops cannot write out of
    # bounds.
    oc = out_smem.shape[0]  # words
    n = lens_ref[b]

    cp_in = pltpu.make_async_copy(
        keys_ref.at[pl.ds(b * fc, fc)], key_smem, sem_in
    )
    cp_in.start()
    cp_h = pltpu.make_async_copy(
        hashes_ref.at[pl.ds(b * fc, fc)], hash_smem, sem_hash
    )
    cp_h.start()
    cp_in.wait()
    cp_h.wait()

    def key(i):
        """Unclipped key load (measured clip cost ~2 ops x 8+ loads per
        scan iteration): every call site's index is provably in
        [0, n + 3], and the key image carries 1024 words of top slack
        for the +3 overread (see encode_blocks_scalar)."""
        return key_smem[i]

    def key_v(i):
        """Candidate-verify load: a stale table entry from a previous
        kernel invocation (same epoch residue) can carry a position up
        to 65535, past a small fragment's image — the one site that
        still needs a clamp."""
        return key_smem[jnp.minimum(i, fc - 1)]

    # Epoch-tagged hash table: entry = (b+1) << 16 | pos. Stale entries
    # from other blocks fail the epoch check, so the 16K-entry table is
    # never cleared (a scalar clear would cost more than the scan).
    epoch = ((b & 0x7FFF) + 1) << 16

    # --- emission into the word-packed output image ---------------------
    # Round-3 rework: the output is 4 LE bytes per int32 (like the
    # decoder's), written with the same garbage-tail contract — bytes
    # >= the emission frontier are garbage until a later tag overwrites
    # them, and every writer merge-preserves only bytes below its own
    # start. Tag bytes go through a read-modify-write of the frontier
    # word plus one unconditional spill store; literal payloads copy
    # PRE-FUNNELED words straight out of the key image (key(i) IS the
    # unaligned 32-bit window at byte i), one load + one store per 4
    # bytes instead of 3 ops per byte. Quarter the output DMA, and the
    # two ~50-cycle lax.conds per literal plus one per copy are gone.

    def tag3(p, tagword):
        """Store 3 tag bytes of tagword at byte offset p (RMW merge +
        unconditional spill of the shifted remainder into the next
        word — garbage above the frontier, overwritten later)."""
        w = p >> 2
        da8 = (p & 3) * 8
        out_smem[w] = (out_smem[w] & ((1 << da8) - 1)) | (tagword << da8)
        # (t >> 1) >> (31 - da8) == t >> (32 - da8) without the
        # undefined shift-by-32 lane at da8 == 0.
        out_smem[w + 1] = jax.lax.shift_right_logical(
            jax.lax.shift_right_logical(tagword, 1), 31 - da8
        )

    def emit_literal_stores(op, lit_start, llen):
        """Literal tag + payload stores (SnappyCompressor.cs:417-464);
        requires llen >= 1. The payload streams from the key image."""
        lm1 = llen - 1
        extra = jnp.where(llen > 256, 2, jnp.where(llen > 60, 1, 0))
        b0 = jnp.where(extra == 0, lm1 << 2, (59 + extra) << 2)
        tag3(op, b0 | ((lm1 & 0xFF) << 8) | (((lm1 >> 8) & 0xFF) << 16))
        q = op + 1 + extra
        w0 = q >> 2
        da8 = (q & 3) * 8
        out_smem[w0] = (out_smem[w0] & ((1 << da8) - 1)) | (
            key(lit_start) << da8
        )
        s1 = lit_start + 4 - (q & 3)
        nw = ((q + llen - 1) >> 2) - w0  # words after w0

        @pl.when(nw > 0)
        def _():
            out_smem[w0 + 1] = key(s1)
            out_smem[w0 + 2] = key(s1 + 4)

            @pl.when(nw > 2)
            def _():
                out_smem[w0 + 3] = key(s1 + 8)
                out_smem[w0 + 4] = key(s1 + 12)

                @pl.when(nw > 4)
                def _():
                    def cp(k, _):
                        w = w0 + 5 + 4 * k
                        s = s1 + 16 + 16 * k
                        out_smem[w] = key(s)
                        out_smem[w + 1] = key(s + 4)
                        out_smem[w + 2] = key(s + 8)
                        out_smem[w + 3] = key(s + 12)
                        return 0

                    jax.lax.fori_loop(0, (nw - 1) >> 2, cp, 0,
                                      unroll=False)

    def emit_literal_checked(op, lit_start, lit_end):
        """Branchless wrapper: stores under a cheap pl.when, the
        advance computed arithmetically (the two lax.conds this
        replaces cost ~50 cycles each)."""
        llen = lit_end - lit_start

        @pl.when(llen > 0)
        def _():
            emit_literal_stores(op, lit_start, llen)

        extra = jnp.where(llen > 256, 2, jnp.where(llen > 60, 1, 0))
        return op + jnp.where(llen > 0, 1 + extra + llen, 0)

    def emit_copy_upto64(op, off, length):
        """One copy tag (SnappyCompressor.cs:466-505), branch-free:
        both tag forms are computed, the copy-1 form selected when it
        applies, and 3 bytes always stored — the copy-1 overstore at
        op+2 is garbage above the frontier. Measured on chip: kills a
        ~50-cycle lax.cond per copy."""
        is1 = (length <= 11) & (off < 2048)
        b0 = jnp.where(
            is1,
            1 | ((length - 4) << 2) | ((off >> 8) << 5),
            2 | ((length - 1) << 2),
        )
        tag3(op, b0 | ((off & 0xFF) << 8) | (((off >> 8) & 0xFF) << 16))
        return op + jnp.where(is1, 2, 3)

    def emit_copy(op, off, length):
        """Repeated-64 emission with the 64<len<68 split
        (SnappyCompressor.cs:507-543), the split branchless: the second
        tag is always stored (garbage above the frontier when unsplit)
        and only the advance is conditional."""
        def big_cond(st):
            op, length = st
            return length >= 68

        def big_body(st):
            op, length = st
            return emit_copy_upto64(op, off, 64), length - 64

        op, length = jax.lax.while_loop(big_cond, big_body, (op, length))
        is_split = length > 64
        l1 = jnp.where(is_split, 60, length)
        op1 = emit_copy_upto64(op, off, l1)
        op2 = emit_copy_upto64(op1, off, jnp.maximum(length - 60, 4))
        return jnp.where(is_split, op2, op1)

    margin = 15  # InputMarginBytes (Constants.cs:27)

    def scan_cond(st):
        ip, lit_start, op, skip = st
        return ip + margin < n

    def on_hit(at, cand, lit_start, op):
        # The extension walk is factored into _match_extension so the
        # FindMatchLength golden-vector suite can drive the exact
        # production logic through a probe kernel (test hook analog of
        # SnappyDecompressor.cs:686-718). The seed callback stores
        # hash-table entries from the covered span (positions at+1+8k
        # since the round-4 stride-8 walk — ~2.4 entries per average
        # match, still denser than the reference's 2 per match; the
        # r2 seed ladder measured stride 4 17% faster than stride 2
        # for +0.8% size). Merging the seed into the extension while
        # was measured at -166 us/block; a sloppy seed from the final
        # mismatching iteration is safe because every probe verifies
        # key(cand) == cur before use.
        if exact_cands:
            seed = None  # no table to seed in best mode
        else:
            def seed(pos):
                p = jnp.minimum(pos - 3, n - 5)
                table_smem[hash_smem[p]] = epoch | p

        m = _match_extension(key, at, cand, n, seed=seed)

        op2 = emit_literal_checked(op, lit_start, at)
        op3 = emit_copy(op2, at - cand, m)
        end = at + m
        return end, end, op3, jnp.int32(skip_base)

    if exact_cands:

        def scan_body(st):
            # level="best" walk: one precomputed candidate per position
            # (widest-first nearest match), verified exactly on its
            # first 4 bytes. No table, no hashing; a gentle skip stride
            # (>> 7) keeps incompressible stretches bounded while
            # barely costing density.
            ip, lit_start, op, skip = st
            c = hash_smem[ip]
            hit = (c >= 0) & (key_v(c) == key(ip))
            return jax.lax.cond(
                hit,
                lambda: on_hit(ip, c, lit_start, op),
                lambda: (
                    ip + 1 + (skip >> 7), lit_start, op, skip + 1
                ),
            )

        ip, lit_start, op, skip = jax.lax.while_loop(
            scan_cond, scan_body,
            (jnp.minimum(jnp.int32(1), n), jnp.int32(0), jnp.int32(0),
             jnp.int32(skip_base)),
        )
        op = emit_literal_checked(op, lit_start, n)
        outlen_ref[b] = op

        cp_out = pltpu.make_async_copy(
            out_smem, out_ref.at[pl.ds(b * oc, oc)], sem_out
        )
        cp_out.start()
        cp_out.wait()
        return

    def scan_body(st):
        ip, lit_start, op, skip = st
        # Branch-free quad probing: the loop machinery dominates the
        # miss path (~140 cycles/iteration measured) while *independent*
        # SMEM loads overlap almost for free — so probe four adjacent
        # positions unconditionally, resolve the first hit with plain
        # arithmetic, and branch once. Intra-group key equality supplies
        # the short-offset candidates a sequential probe would have
        # found via its own just-written entries.
        curs = [key(ip + d) for d in range(4)]
        hs = [hash_smem[ip + d] for d in range(4)]
        entries = [table_smem[h] for h in hs]
        for d in range(4):
            table_smem[hs[d]] = epoch | (ip + d)
        hits = []
        cands = []
        for d in range(4):
            cand_t = entries[d] & 0xFFFF
            ok = (
                ((entries[d] >> 16) == (epoch >> 16))
                & (cand_t < ip + d)
                & (key_v(cand_t) == curs[d])
            )
            cand = jnp.where(ok, cand_t, 0)
            for i in range(d):
                same = curs[i] == curs[d]
                cand = jnp.where(same, ip + i, cand)  # nearest previous wins
                ok = ok | same
            hits.append(ok)
            cands.append(cand)

        hit_any = hits[0] | hits[1] | hits[2] | hits[3]
        d_first = jnp.where(
            hits[0], 0, jnp.where(hits[1], 1, jnp.where(hits[2], 2, 3))
        )
        cand_first = jnp.where(
            hits[0],
            cands[0],
            jnp.where(hits[1], cands[1], jnp.where(hits[2], cands[2], cands[3])),
        )

        return jax.lax.cond(
            hit_any,
            lambda: on_hit(ip + d_first, cand_first, lit_start, op),
            lambda: (ip + 3 + (skip >> 5), lit_start, op, skip + 1),
        )

    ip, lit_start, op, skip = jax.lax.while_loop(
        scan_cond, scan_body,
        (jnp.minimum(jnp.int32(1), n), jnp.int32(0), jnp.int32(0),
         jnp.int32(skip_base)),
    )
    op = emit_literal_checked(op, lit_start, n)
    outlen_ref[b] = op

    cp_out = pltpu.make_async_copy(
        out_smem, out_ref.at[pl.ds(b * oc, oc)], sem_out
    )
    cp_out.start()
    cp_out.wait()


def _keys_from_frags(frags):
    """Vectorized 4-byte LE key at every position (XLA elementwise),
    zero-padded by 1024 so sloppy scalar-loop overreads stay in
    bounds."""
    B, F = frags.shape
    pad = jnp.zeros((B, 4), jnp.int32)
    d = jnp.concatenate([frags.astype(jnp.int32), pad], axis=1)
    keys = (
        d[:, 0:F]
        | (d[:, 1 : F + 1] << 8)
        | (d[:, 2 : F + 2] << 16)
        | (d[:, 3 : F + 3] << 24)
    )
    return jnp.concatenate([keys, jnp.zeros((B, 1024), jnp.int32)], axis=1)


def _unpack_bodies(ow, oc):
    """Word-packed emission image (B, ocw) -> byte-per-int32 bodies
    (B, oc), the wrapper-level API contract (cheap XLA elementwise;
    fuses away when the caller repacks for transfer)."""
    B, ocw = ow.shape
    sh = jnp.arange(4, dtype=jnp.int32) * 8
    by = (
        jax.lax.shift_right_logical(ow[:, :, None], sh[None, None, :]) & 0xFF
    ).reshape(B, ocw * 4)
    return by[:, :oc]


@functools.partial(
    jax.jit,
    static_argnames=(
        "interpret", "hash_bits", "skip_base", "core_parallel", "packed"
    ),
)
def encode_blocks_scalar(
    frags,
    lengths,
    interpret: bool | None = None,
    hash_bits: int = _HASH_BITS,
    skip_base: int = 32,
    core_parallel: bool | None = None,
    packed: bool = False,
):
    """Compress a batch of fragments on the TPU scalar core.

    Args:
      frags: int32[B, F] byte values (F <= BLOCK_SIZE, multiple of 128).
      lengths: int32[B].
      hash_bits: match-table size log2 (reference tunable, HashTable.cs
        :14-18 sizes 8..14; here 15 measured best — time-neutral with
        better ratio than 14, while 13/12 were time-neutral with worse
        ratio and 16 exceeds SMEM).
      skip_base: skip-heuristic start constant (SnappyCompressor.cs:227
        uses 32; the scan stride grows as ``skip >> 5``).

    Returns: (bodies int32[B, F + 2048], body_lens int32[B]) — fragment
    tag streams without varint preambles (SnappyCompressor.cs:34-80
    assembly is the caller's job). With ``packed=True``, bodies come
    back as the kernel's word-packed emission image int32[B, ocw]
    (4 LE bytes per lane, DMA-tiled width) — the transfer-optimal form,
    skipping the unpack/repack round trip entirely (round-5 review
    finding; byte content is identical, garbage tails included).
    """
    if interpret is None:
        interpret = _interpret_default()
    if core_parallel is None:
        core_parallel = _core_parallel_default()
    frags = frags.astype(jnp.int32)
    B, F = frags.shape
    if B > _EPOCH_BLOCKS:
        # The table's epoch tag carries 15 bits (entry = epoch<<16 |
        # pos), so grid ranks _EPOCH_BLOCKS apart share a residue and
        # stale entries from the aliased rank pass the epoch check —
        # never a correctness issue (every candidate is verified
        # against the current block's bytes, see key_v) but a silent
        # match-density degradation on giant batches (round-5 verdict
        # item 9). Splitting into <=_EPOCH_BLOCKS-block invocations
        # reduces the exposure to the same benign cross-invocation
        # staleness the kernel already tolerates: at most one table's
        # worth of stale entries per boundary instead of systematic
        # aliasing across the whole batch.
        parts = [
            encode_blocks_scalar(
                frags[i : i + _EPOCH_BLOCKS],
                lengths[i : i + _EPOCH_BLOCKS],
                interpret=interpret,
                hash_bits=hash_bits,
                skip_base=skip_base,
                core_parallel=core_parallel,
                packed=packed,
            )
            for i in range(0, B, _EPOCH_BLOCKS)
        ]
        return (
            jnp.concatenate([p[0] for p in parts], axis=0),
            jnp.concatenate([p[1] for p in parts], axis=0),
        )
    assert F % 1024 == 0 and F <= BLOCK_SIZE  # 1-D DMA tiling
    assert 8 <= hash_bits <= 16
    oc = F + 2048  # provable emission bound + >=1 KiB margin (see kernel)
    ocw = -(-(oc // 4) // 1024) * 1024  # word-packed image, DMA-tiled
    keys = _keys_from_frags(frags)
    # Hashes precomputed on the VPU (one vector multiply) instead of 4
    # scalar multiplies per probe group in-kernel (HashTable.cs:91-126
    # magic-multiply form; measured ~8% on chip).
    hashes = jax.lax.shift_right_logical(
        keys * _HASH_MUL, 32 - hash_bits
    ) & ((1 << hash_bits) - 1)
    ow, body_lens = pl.pallas_call(
        functools.partial(
            _encode_kernel, hash_bits=hash_bits, skip_base=skip_base
        ),
        grid=(B,),
        out_shape=(
            jax.ShapeDtypeStruct((B * ocw,), jnp.int32),
            jax.ShapeDtypeStruct((B,), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.SMEM((F + 1024,), jnp.int32),  # overread slack
            pltpu.SMEM((F + 1024,), jnp.int32),  # precomputed hashes
            pltpu.SMEM((ocw,), jnp.int32),  # word-packed output image
            pltpu.SMEM((1 << hash_bits,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=_compiler_params(core_parallel),
        interpret=interpret,
    )(keys.reshape(-1), hashes.reshape(-1), lengths.astype(jnp.int32))
    ow = ow.reshape(B, ocw)
    if packed:
        return ow, body_lens
    return _unpack_bodies(ow, oc), body_lens


def encode_blocks_best(
    frags,
    lengths,
    widths: tuple | None = None,
    skip_base: int = 32,
    interpret: bool | None = None,
    core_parallel: bool | None = None,
):
    """``level="best"`` encoder: the scalar emission walk driven by
    VPU-precomputed exact-nearest multi-width candidates
    (ops.best_match.exact_candidates) instead of a lossy hash table.

    Matches the rank-doubling scan engine's density (prototype: 0.2115
    vs 0.2119 on html's first 64 KiB; reference greedy 0.2406) at sort
    cost — ~2 row sorts per width — instead of the scan engine's ~50
    gather passes. Same output contract as encode_blocks_scalar.

    Deliberately TWO dispatches (candidate jit, then pallas jit), not
    one fused program: a sort prepass and an interpreter-mode
    pallas_call fused into one XLA:CPU executable mis-executes on
    repeat dispatch after a batch-size change ("supplied 2 buffers but
    expected 4", round-3 finding, minimal repro in the test below) —
    and callers must NOT re-wrap this function in jit for the same
    reason. Two dispatches are noise at best-level granularity."""
    from snappier_tpu.ops.best_match import DEFAULT_WIDTHS, exact_candidates

    if widths is None:
        widths = DEFAULT_WIDTHS
    cands = exact_candidates(frags, lengths, widths=widths)
    return _encode_best_pallas(
        frags, lengths, cands, skip_base=skip_base, interpret=interpret,
        core_parallel=core_parallel,
    )


@functools.partial(
    jax.jit, static_argnames=("interpret", "skip_base", "core_parallel")
)
def _encode_best_pallas(frags, lengths, cands, skip_base=32,
                        interpret: bool | None = None,
                        core_parallel: bool | None = None):
    if interpret is None:
        interpret = _interpret_default()
    if core_parallel is None:
        core_parallel = _core_parallel_default()
    frags = frags.astype(jnp.int32)
    B, F = frags.shape
    assert F % 1024 == 0 and F <= BLOCK_SIZE
    oc = F + 2048
    ocw = -(-(oc // 4) // 1024) * 1024  # word-packed image, DMA-tiled
    keys = _keys_from_frags(frags)
    cands = jnp.concatenate(
        [cands.astype(jnp.int32), jnp.full((B, 1024), -1, jnp.int32)],
        axis=1,
    )
    ow, body_lens = pl.pallas_call(
        functools.partial(
            _encode_kernel, skip_base=skip_base, exact_cands=True
        ),
        grid=(B,),
        out_shape=(
            jax.ShapeDtypeStruct((B * ocw,), jnp.int32),
            jax.ShapeDtypeStruct((B,), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.SMEM((F + 1024,), jnp.int32),  # keys + overread slack
            pltpu.SMEM((F + 1024,), jnp.int32),  # candidates
            pltpu.SMEM((ocw,), jnp.int32),  # word-packed output image
            pltpu.SMEM((8,), jnp.int32),  # dummy (no table in best mode)
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=_compiler_params(core_parallel),
        interpret=interpret,
    )(keys.reshape(-1), cands.reshape(-1), lengths.astype(jnp.int32))
    return _unpack_bodies(ow.reshape(B, ocw), oc), body_lens
