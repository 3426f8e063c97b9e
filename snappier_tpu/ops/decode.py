"""Vectorized Snappy block decoder.

The reference decodes with a sequential tag state machine
(``SnappyDecompressor.DecompressAllTags``, SnappyDecompressor.cs:184-347)
plus PSHUFB pattern copies (``CopyHelpers.IncrementalCopy``,
CopyHelpers.cs:64-219). A byte-serial state machine is the wrong shape
for a TPU, so this decoder re-derives the same wire semantics as three
data-parallel passes over the whole compressed buffer (SURVEY.md §2.3
N3/N4):

1. **Speculative tag parse** — for *every* byte position, compute "if a
   tag started here": its advance (tag bytes + inline literal payload),
   output length, copy offset, and literal source. Pure elementwise
   VPU arithmetic; no lookup tables needed.
2. **Tag-boundary resolution** — the real tag starts are the orbit of
   ``next(p) = p + advance(p)`` from the end of the varint preamble.
   Resolved by pointer doubling in O(log n) gather/scatter rounds,
   simultaneously accumulating suffix sums of output length, which
   yield every tag's output offset without a separate scan.
3. **Output materialization** — each output byte's provenance is a
   pointer: literals point (negated) into the compressed input, copies
   point at an earlier *output* byte. Copy-of-copy chains (including
   the offset<length pattern-replication semantics of
   ``IncrementalCopy``) collapse in O(log n) rounds of path-halving,
   after which a single gather from the input produces the output.

Validation matches the reference's strictness (SnappyDecompressor.cs
:570-606): truncated tags, zero/out-of-range offsets, and
length-preamble mismatches all raise (as a device-computed error word
checked by the host runtime).

All shapes are static: the compressed buffer is padded to ``comp_cap``
and the output to ``out_cap``; actual lengths are traced scalars.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from snappier_tpu.constants import (
    MAX_SHORT_LITERAL,
    TAG_COPY1,
    TAG_COPY2,
    TAG_LITERAL,
)

# Error bits in the returned status word.
ERR_TRUNCATED_TAG = 1  # a tag (or its literal payload) overruns the input
ERR_BAD_OFFSET = 2  # copy offset of zero or beyond produced output
ERR_LENGTH_MISMATCH = 4  # tag stream output != varint preamble claim
ERR_BAD_PREAMBLE = 8  # malformed/oversized varint preamble

#: Sentinel "impossibly large" length used to poison >31-bit fields so
#: they trip the normal bounds checks without int32 overflow.
_HUGE = 1 << 28


def _log2_ceil(n: int) -> int:
    return max(1, (n - 1).bit_length())


def parse_varint_device(comp: jnp.ndarray):
    """Parse the LEB128 length preamble from the first 5 bytes.

    Returns ``(value, nbytes, err)`` as traced scalars. Mirrors
    VarIntEncoding.Read.cs:26-91 including 5-byte/u32 strictness.
    """
    b = [comp[i].astype(jnp.int32) for i in range(5)]
    cont = [x >= 128 for x in b]
    # Number of bytes: first index with continuation bit clear, + 1.
    n = jnp.where(
        ~cont[0], 1,
        jnp.where(~cont[1], 2,
                  jnp.where(~cont[2], 3,
                            jnp.where(~cont[3], 4, 5))),
    )
    use = [n > i for i in range(5)]
    val = (b[0] & 0x7F)
    val += jnp.where(use[1], (b[1] & 0x7F) << 7, 0)
    val += jnp.where(use[2], (b[2] & 0x7F) << 14, 0)
    val += jnp.where(use[3], (b[3] & 0x7F) << 21, 0)
    # Byte 5 holds bits 28..31; >= 8 overflows u32, and any value
    # >= 2^28 overflows the int32 pipeline (and no real output is that
    # large per call) — poison instead of wrapping.
    big5 = use[4] & (b[4] > 0)
    val = jnp.where(big5, _HUGE, val)
    err = jnp.where((n == 5) & (b[4] >= 8), ERR_BAD_PREAMBLE, 0)
    err = err | jnp.where(val < 0, ERR_BAD_PREAMBLE, 0)
    return val, n, err


def _speculative_parse(c0, c1, c2, c3, c4):
    """Per-position tag fields, assuming a tag starts at each byte.

    Wire law per SURVEY.md §2.1 (Constants.cs:18-41,
    SnappyDecompressor.cs:254-340)."""
    tag_type = c0 & 3
    len6 = c0 >> 2

    # Literal: inline payload follows the (1 + extra)-byte descriptor.
    lit_extra = jnp.where(len6 < MAX_SHORT_LITERAL, 0, len6 - 59)
    lit_len_long = (
        c1
        + jnp.where(lit_extra >= 2, c2 << 8, 0)
        + jnp.where(lit_extra >= 3, c3 << 16, 0)
    )
    # A 4th length byte pushes past 2^24; any nonzero value exceeds the
    # 2^28 pipeline cap, so poison rather than overflow int32.
    lit_big = (lit_extra == 4) & (c4 > 0)
    lit_len = jnp.where(lit_extra == 0, len6 + 1, lit_len_long + 1)
    lit_len = jnp.where(lit_big, _HUGE, lit_len)

    copy1_len = ((c0 >> 2) & 7) + 4
    copy1_off = ((c0 >> 5) << 8) | c1
    copy2_len = len6 + 1
    copy2_off = c1 | (c2 << 8)
    copy4_len = len6 + 1
    copy4_off = c1 | (c2 << 8) | (c3 << 16)
    copy4_off = jnp.where(c4 > 0, _HUGE, copy4_off)  # >2^24 can't be valid

    is_literal = tag_type == TAG_LITERAL
    out_len = jnp.where(
        is_literal,
        lit_len,
        jnp.where(tag_type == TAG_COPY1, copy1_len,
                  jnp.where(tag_type == TAG_COPY2, copy2_len, copy4_len)),
    )
    advance = jnp.where(
        is_literal,
        1 + lit_extra + lit_len,
        jnp.where(tag_type == TAG_COPY1, 2,
                  jnp.where(tag_type == TAG_COPY2, 3, 5)),
    )
    offset = jnp.where(
        tag_type == TAG_COPY1, copy1_off,
        jnp.where(tag_type == TAG_COPY2, copy2_off, copy4_off),
    )
    lit_src = 1 + lit_extra  # literal payload offset relative to the tag
    return is_literal, out_len, advance, offset, lit_src


@functools.partial(jax.jit, static_argnames=("out_cap",))
def decode_block(comp: jnp.ndarray, comp_len: jnp.ndarray, out_cap: int):
    """Decode one Snappy block.

    Args:
      comp: int32[comp_cap] — compressed bytes (varint preamble + tag
        stream), zero-padded to a static capacity >= comp_len + 8.
      comp_len: traced scalar — actual compressed length.
      out_cap: static output capacity; decoding a block whose preamble
        claims more than this sets ``ERR_LENGTH_MISMATCH``-style failure
        via the error word (host picks a bucket >= claimed length).

    Returns:
      (out, out_len, err): int32[out_cap] decoded bytes, traced actual
      length, and an error word (0 = success).
    """
    comp = comp.astype(jnp.int32)
    comp_cap = comp.shape[0]
    n = comp_len.astype(jnp.int32)

    expected, pre_len, err = parse_varint_device(comp)
    err = err | jnp.where(expected > out_cap, ERR_BAD_PREAMBLE, 0)
    err = err | jnp.where(pre_len > n, ERR_BAD_PREAMBLE, 0)
    body_start = pre_len

    # Shifted views c0..c4 (c_k[p] = comp[p + k], zero past the end).
    cpad = jnp.concatenate([comp, jnp.zeros(8, jnp.int32)])
    c0, c1, c2, c3, c4 = (cpad[k : k + comp_cap] for k in range(5))

    is_literal, out_len_at, advance, offset, lit_rel = _speculative_parse(
        c0, c1, c2, c3, c4
    )

    pos = jax.lax.broadcasted_iota(jnp.int32, (comp_cap, 1), 0)[:, 0]
    in_body = pos < n
    raw_next = pos + jnp.minimum(advance, _HUGE)

    # Sentinel-extended (size comp_cap+1) jump & suffix-sum tables.
    sentinel = comp_cap
    nxt = jnp.where(in_body & (raw_next <= n), raw_next, sentinel)
    nxt = jnp.concatenate([nxt, jnp.array([sentinel], jnp.int32)])
    tail = jnp.where(in_body, out_len_at, 0)
    tail = jnp.concatenate([tail, jnp.zeros(1, jnp.int32)])

    # Reachability from body_start + suffix sums, by pointer doubling.
    reach = (
        jax.lax.broadcasted_iota(jnp.int32, (comp_cap + 1, 1), 0)[:, 0]
        == body_start
    ).astype(jnp.int32)

    def doubling_step(_, carry):
        nxt, tail, reach = carry
        reach = reach.at[nxt].max(reach, mode="drop")
        tail = tail + tail[nxt]
        nxt = nxt[nxt]
        return nxt, tail, reach

    steps = _log2_ceil(comp_cap + 1)
    nxt, tail, reach = jax.lax.fori_loop(
        0, steps, doubling_step, (nxt, tail, reach), unroll=False
    )
    is_tag = (reach[:comp_cap] > 0) & in_body

    total_out = tail[jnp.clip(body_start, 0, comp_cap)]
    out_start = total_out - tail[:comp_cap]  # valid where is_tag

    # Validation.
    err = err | jnp.where(
        jnp.any(is_tag & (raw_next > n)), ERR_TRUNCATED_TAG, 0
    )
    err = err | jnp.where(
        jnp.any(is_tag & ~is_literal & ((offset == 0) | (offset > out_start))),
        ERR_BAD_OFFSET,
        0,
    )
    err = err | jnp.where(total_out != expected, ERR_LENGTH_MISMATCH, 0)

    # --- Output materialization ------------------------------------------
    # Covering tag per output byte: scatter tag positions at their output
    # offsets, then a running max.
    scatter_idx = jnp.where(is_tag, out_start, out_cap)
    cover = jnp.zeros(out_cap, jnp.int32).at[scatter_idx].max(
        pos + 1, mode="drop"
    )
    cover = jax.lax.cummax(cover) - 1  # tag position covering each q
    cover = jnp.clip(cover, 0, comp_cap - 1)

    q = jax.lax.broadcasted_iota(jnp.int32, (out_cap, 1), 0)[:, 0]
    j = q - out_start[cover]  # byte index within the covering tag
    tag_is_lit = is_literal[cover]
    # Provenance pointer: literals resolve (negative encoding of an
    # input index); copies point at an earlier output byte.
    lit_ptr = -(cover + lit_rel[cover] + j) - 1
    copy_ptr = q - offset[cover]
    ptr = jnp.where(tag_is_lit, lit_ptr, jnp.maximum(copy_ptr, 0))
    ptr = jnp.where(q < expected, ptr, -1)

    def halve(_, p):
        hop = p[jnp.clip(p, 0, out_cap - 1)]
        return jnp.where(p >= 0, hop, p)

    ptr = jax.lax.fori_loop(0, _log2_ceil(out_cap), halve, ptr, unroll=False)

    src = jnp.clip(-ptr - 1, 0, comp_cap - 1)
    out = jnp.where(q < expected, cpad[:comp_cap][src], 0)
    return out, expected, err
