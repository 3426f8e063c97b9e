"""Decode-kernel ablation probe (run on the real TPU chip).

Round-2 experiment harness: variants of the scalar-core decode walk,
timed on B x 64 KiB html blocks with the bench.py methodology (host
fetch as completion barrier, best-of-N). Winners get ported into
ops/pallas/scalar_codec.py; results are recorded in docs/ROADMAP.md.

Usage: python tools/perf_probe.py [variant ...]
Variants:
  v0      library kernel (baseline)
  v1      unified comp+out SMEM image, straight-line sloppy-16 copy,
          fori only for length > 16, byte loop only for off < 8
  v1nock  v1 without per-tag error checks (quantifies check cost)
  v1nocp  v1 without any copies (walk floor)
"""

from __future__ import annotations

import functools
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from snappier_tpu.constants import BLOCK_SIZE
from snappier_tpu.ops.pallas.scalar_codec import _tag_lut

jax.config.update(
    "jax_compilation_cache_dir",
    str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache_tpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

_POISON = 1 << 28


def _decode_kernel_v2(words_ref, lut_ref, lens_ref, out_ref,
                      outlen_ref, err_ref, words_smem, ow_smem,
                      sem_in, sem_out, *, cc, owc):
    """Word-packed decode: the output image is 4 bytes per int32 and
    copies stream via funnel shifts — 1 load + 1 store + ~4 ALU ops
    per 4 bytes instead of ~2 SMEM ops per byte. The partial frontier
    word is always stored with a garbage tail (bytes >= the frontier
    are never read and later overwritten), so there is no carry
    register and copy sources can always read the image."""
    b = pl.program_id(0)
    wc = words_smem.shape[0]
    n = lens_ref[b]
    oc = owc * 4 - 1024  # logical output capacity in bytes

    cp_in = pltpu.make_async_copy(
        words_ref.at[pl.ds(b * wc, wc)], words_smem, sem_in
    )
    cp_in.start()
    cp_in.wait()

    def rd(i):
        ii = jnp.clip(i, 0, cc - 1)
        return jax.lax.shift_right_logical(
            words_smem[ii >> 2], (ii & 3) * 8
        ) & 0xFF

    def window5(i):
        wi = i >> 2
        sh = (i & 3) * 8
        w0 = words_smem[wi]
        w1 = words_smem[jnp.minimum(wi + 1, wc - 1)]
        lo = jax.lax.shift_right_logical(w0, sh)
        v32 = jnp.where(sh == 0, w0, lo | (w1 << (32 - sh)))
        b4 = jax.lax.shift_right_logical(w1, sh) & 0xFF
        return v32, b4

    def var_body(state):
        i, val, done, err = state
        byte = rd(i)
        val = val | ((byte & 0x7F) << jnp.minimum(7 * i, 28))
        done = byte < 0x80
        err = jnp.where((i == 4) & (byte >= 8), 8, err)
        return i + 1, val, done, err

    def var_cond(state):
        i, val, done, err = state
        return (~done) & (i < 5) & (err == 0)

    pre_len, expected, done, err = jax.lax.while_loop(
        var_cond, var_body, (jnp.int32(0), jnp.int32(0), False, jnp.int32(0))
    )
    err = jnp.where(~done, 8, err)
    err = jnp.where(pre_len > n, 8, err)
    err = jnp.where(expected > oc, 8, err)
    err = jnp.where(expected < 0, 8, err)

    def funnel(lo, hi, a8, hs, hm):
        return jax.lax.shift_right_logical(lo, a8) | ((hi << hs) & hm)

    def append_stream(S, spos, op, K):
        """Append K bytes read from packed image S at byte spos to the
        output frontier op. Requires spos + t < frontier bytes already
        valid in their image (always true for literals; for copies,
        off >= 8 keeps the stream reads behind the written words).
        Over-stores whole words past the frontier (bytes >= op + K are
        garbage until a later tag overwrites them — never read)."""
        rel = spos - op
        a8 = (rel & 3) * 8
        rw = rel >> 2  # arithmetic shift: floor for negative rel
        hs = (32 - a8) & 31
        hm = jnp.where(a8 == 0, 0, jnp.int32(-1))
        w0 = op >> 2
        da8 = (op & 3) * 8
        lowmask = (1 << da8) - 1
        smax = jnp.int32(S.shape[0] - 1)

        def sw(i):
            return S[jnp.clip(i, 0, smax)]

        base = w0 + rw
        prev = sw(base)
        nxt = sw(base + 1)
        sv = funnel(prev, nxt, a8, hs, hm)
        ow_smem[w0] = (ow_smem[w0] & lowmask) | (sv & ~lowmask)
        nw = ((op + K - 1) >> 2) - w0  # full/partial words after w0

        @pl.when(nw > 0)
        def _():
            # Unrolled pair covers nw <= 2 (the common case) branch-
            # free; the second store may be pure over-store.
            n2 = sw(base + 2)
            ow_smem[w0 + 1] = funnel(nxt, n2, a8, hs, hm)
            n3 = sw(base + 3)
            ow_smem[w0 + 2] = funnel(n2, n3, a8, hs, hm)

            @pl.when(nw > 2)
            def _():
                def cp(k, carry):
                    w = w0 + 3 + 2 * k
                    m1 = sw(w + rw + 1)
                    ow_smem[w] = funnel(carry, m1, a8, hs, hm)
                    m2 = sw(w + rw + 2)
                    ow_smem[w + 1] = funnel(m1, m2, a8, hs, hm)
                    return m2

                jax.lax.fori_loop(0, (nw - 1) >> 1, cp, n3, unroll=False)

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

    def tag_cond(state):
        ip, op, err = state
        return (ip < n) & (err == 0)

    def tag_body(state):
        ip, op, err = state
        v32, b4 = window5(ip)
        tag = v32 & 0xFF
        d = lut_ref[tag]
        hdr = d & 7
        is_lit = (d & 8) != 0
        L = (d >> 4) & 0x7F
        extra = (d >> 11) & 7
        rest = jax.lax.shift_right_logical(v32, 8)

        mask = jax.lax.shift_right_logical(jnp.int32(-1), (4 - extra) * 8)
        longlen = (rest & mask) + 1
        longlen = jnp.where((extra == 4) & (b4 > 0), _POISON, longlen)
        length = jnp.where(is_lit & (extra > 0), longlen, L)

        ttype = d >> 25
        off = jnp.where(
            ttype == 1,
            ((d >> 14) & 0x7FF) | (rest & 0xFF),
            jnp.where(
                ttype == 2,
                rest & 0xFFFF,
                jnp.where(b4 > 0, _POISON, rest),
            ),
        )

        advance = hdr + jnp.where(is_lit, length, 0)
        e = jnp.where(ip + advance > n, 1, 0)
        e = jnp.where(~is_lit & ((off <= 0) | (off > op)), 2, e)
        e = jnp.where((op + length > expected) | (length < 0), 4, e)
        ok = e == 0

        @pl.when(ok & is_lit)
        def _():
            append_stream(words_smem, ip + hdr, op, length)

        @pl.when(ok & ~is_lit & (off >= 8))
        def _():
            append_stream(ow_smem, op - off, op, length)

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
                append_stream(
                    ow_smem, op + 14 - off2, op + 14, length - 14
                )

        return ip + advance, op + jnp.where(ok, length, 0), e

    ip, op, err = jax.lax.while_loop(
        tag_cond, tag_body, (pre_len, jnp.int32(0), err)
    )
    err = jnp.where((err == 0) & (op != expected), 4, err)

    outlen_ref[b] = jnp.where(err == 0, expected, 0)
    err_ref[b] = err

    cp_out = pltpu.make_async_copy(
        ow_smem, out_ref.at[pl.ds(b * owc, owc)], sem_out
    )
    cp_out.start()
    cp_out.wait()


@functools.partial(jax.jit, static_argnames=("out_cap",))
def decode_v2(comp, comp_lens, out_cap: int = BLOCK_SIZE):
    comp = comp.astype(jnp.int32)
    B, CC = comp.shape
    assert CC % 1024 == 0 and out_cap % 1024 == 0
    words = (
        comp.reshape(B, CC // 4, 4)
        * jnp.array([1, 1 << 8, 1 << 16, 1 << 24], jnp.int32)
    ).sum(axis=2, dtype=jnp.int32)
    wc = -(-(CC // 4) // 1024) * 1024
    words = jnp.concatenate(
        [words, jnp.zeros((B, wc - CC // 4), jnp.int32)], axis=1
    )
    owc = -(-(out_cap + 1024) // 4 // 1024) * 1024  # words, DMA-tiled
    kern = functools.partial(_decode_kernel_v2, cc=CC, owc=owc)
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
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.SMEM((wc,), jnp.int32),
            pltpu.SMEM((owc,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=False,
    )(
        words.reshape(-1),
        jnp.asarray(_tag_lut()),
        comp_lens.astype(jnp.int32),
    )
    ow = ow_flat.reshape(B, owc)
    # unpack words -> byte-per-int32 (XLA elementwise)
    sh = jnp.arange(4, dtype=jnp.int32) * 8
    by = (
        jax.lax.shift_right_logical(ow[:, :, None], sh[None, None, :]) & 0xFF
    ).reshape(B, owc * 4)
    return by[:, :out_cap], out_lens, errs


def _decode_kernel_v4(words_ref, lut_ref, lens_ref, out_ref,
                      outlen_ref, err_ref, words_smem, ow_smem,
                      sem_in, sem_out, *, cc, owc):
    """v2 with (a) the first copy pair stored unconditionally — safe
    because bytes >= the frontier are garbage-until-overwritten by
    construction, and a following tag's first-word RMW only preserves
    bytes < its own frontier — and (b) error classification deferred
    out of the loop (one re-parse of the failing tag)."""
    b = pl.program_id(0)
    wc = words_smem.shape[0]
    n = lens_ref[b]
    oc = owc * 4 - 1024

    cp_in = pltpu.make_async_copy(
        words_ref.at[pl.ds(b * wc, wc)], words_smem, sem_in
    )
    cp_in.start()
    cp_in.wait()

    def rd(i):
        ii = jnp.clip(i, 0, cc - 1)
        return jax.lax.shift_right_logical(
            words_smem[ii >> 2], (ii & 3) * 8
        ) & 0xFF

    def window5(i):
        wi = i >> 2
        sh = (i & 3) * 8
        w0 = words_smem[wi]
        w1 = words_smem[jnp.minimum(wi + 1, wc - 1)]
        lo = jax.lax.shift_right_logical(w0, sh)
        v32 = jnp.where(sh == 0, w0, lo | (w1 << (32 - sh)))
        b4 = jax.lax.shift_right_logical(w1, sh) & 0xFF
        return v32, b4

    def var_body(state):
        i, val, done, err = state
        byte = rd(i)
        val = val | ((byte & 0x7F) << jnp.minimum(7 * i, 28))
        done = byte < 0x80
        err = jnp.where((i == 4) & (byte >= 8), 8, err)
        return i + 1, val, done, err

    def var_cond(state):
        i, val, done, err = state
        return (~done) & (i < 5) & (err == 0)

    pre_len, expected, done, err = jax.lax.while_loop(
        var_cond, var_body, (jnp.int32(0), jnp.int32(0), False, jnp.int32(0))
    )
    err = jnp.where(~done, 8, err)
    err = jnp.where(pre_len > n, 8, err)
    err = jnp.where(expected > oc, 8, err)
    err = jnp.where(expected < 0, 8, err)

    def funnel(lo, hi, a8, hs, hm):
        return jax.lax.shift_right_logical(lo, a8) | ((hi << hs) & hm)

    def append_stream(S, spos, op, K):
        rel = spos - op
        a8 = (rel & 3) * 8
        rw = rel >> 2
        hs = (32 - a8) & 31
        hm = jnp.where(a8 == 0, 0, jnp.int32(-1))
        w0 = op >> 2
        da8 = (op & 3) * 8
        lowmask = (1 << da8) - 1
        smax = jnp.int32(S.shape[0] - 1)

        def sw(i):
            return S[jnp.clip(i, 0, smax)]

        base = w0 + rw
        prev = sw(base)
        nxt = sw(base + 1)
        sv = funnel(prev, nxt, a8, hs, hm)
        ow_smem[w0] = (ow_smem[w0] & lowmask) | (sv & ~lowmask)
        # Unconditional pair: pure over-store when the tag fits w0
        # (bytes >= the frontier are dead until a later tag's writes).
        n2 = sw(base + 2)
        ow_smem[w0 + 1] = funnel(nxt, n2, a8, hs, hm)
        n3 = sw(base + 3)
        ow_smem[w0 + 2] = funnel(n2, n3, a8, hs, hm)
        nw = ((op + K - 1) >> 2) - w0

        @pl.when(nw > 2)
        def _():
            def cp(k, carry):
                w = w0 + 3 + 2 * k
                m1 = sw(w + rw + 1)
                ow_smem[w] = funnel(carry, m1, a8, hs, hm)
                m2 = sw(w + rw + 2)
                ow_smem[w + 1] = funnel(m1, m2, a8, hs, hm)
                return m2

            jax.lax.fori_loop(0, (nw - 1) >> 1, cp, n3, unroll=False)

    def append_bytes(spos, op, K):
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

    def parse(ip):
        v32, b4 = window5(ip)
        d = lut_ref[v32 & 0xFF]
        hdr = d & 7
        is_lit = (d & 8) != 0
        L = (d >> 4) & 0x7F
        extra = (d >> 11) & 7
        rest = jax.lax.shift_right_logical(v32, 8)
        mask = jax.lax.shift_right_logical(jnp.int32(-1), (4 - extra) * 8)
        longlen = (rest & mask) + 1
        longlen = jnp.where((extra == 4) & (b4 > 0), _POISON, longlen)
        length = jnp.where(is_lit & (extra > 0), longlen, L)
        ttype = d >> 25
        off = jnp.where(
            ttype == 1,
            ((d >> 14) & 0x7FF) | (rest & 0xFF),
            jnp.where(
                ttype == 2, rest & 0xFFFF,
                jnp.where(b4 > 0, _POISON, rest),
            ),
        )
        advance = hdr + jnp.where(is_lit, length, 0)
        return hdr, is_lit, length, off, advance

    def tag_cond(state):
        ip, op, bad = state
        return (ip < n) & ~bad

    def tag_body(state):
        ip, op, bad = state
        hdr, is_lit, length, off, advance = parse(ip)
        ok = (
            (ip + advance <= n)
            & (is_lit | ((off > 0) & (off <= op)))
            & (op + length <= expected)
            & (length > 0)
        )

        @pl.when(ok & is_lit)
        def _():
            append_stream(words_smem, ip + hdr, op, length)

        @pl.when(ok & ~is_lit & (off >= 8))
        def _():
            append_stream(ow_smem, op - off, op, length)

        @pl.when(ok & ~is_lit & (off < 8))
        def _():
            head = jnp.minimum(length, 14)
            append_bytes(op - off, op, head)

            @pl.when(length > 14)
            def _():
                off2 = off * (14 // jnp.maximum(off, 1))
                append_stream(ow_smem, op + 14 - off2, op + 14, length - 14)

        return (
            jnp.where(ok, ip + advance, ip),
            op + jnp.where(ok, length, 0),
            ~ok,
        )

    ip, op, bad = jax.lax.while_loop(
        tag_cond, tag_body, (pre_len, jnp.int32(0), err != 0)
    )
    # Deferred classification: one re-parse of the failing tag.
    hdr, is_lit, length, off, advance = parse(ip)
    e = jnp.where(ip + advance > n, 1, 0)
    e = jnp.where(~is_lit & ((off <= 0) | (off > op)), 2, e)
    e = jnp.where((op + length > expected) | (length < 0), 4, e)
    err = jnp.where(err != 0, err, jnp.where(bad, e, 0))
    err = jnp.where((err == 0) & (op != expected), 4, err)

    outlen_ref[b] = jnp.where(err == 0, expected, 0)
    err_ref[b] = err

    cp_out = pltpu.make_async_copy(
        ow_smem, out_ref.at[pl.ds(b * owc, owc)], sem_out
    )
    cp_out.start()
    cp_out.wait()


@functools.partial(jax.jit, static_argnames=("out_cap",))
def decode_v4(comp, comp_lens, out_cap: int = BLOCK_SIZE):
    comp = comp.astype(jnp.int32)
    B, CC = comp.shape
    assert CC % 1024 == 0 and out_cap % 1024 == 0
    words = (
        comp.reshape(B, CC // 4, 4)
        * jnp.array([1, 1 << 8, 1 << 16, 1 << 24], jnp.int32)
    ).sum(axis=2, dtype=jnp.int32)
    wc = -(-(CC // 4) // 1024) * 1024
    words = jnp.concatenate(
        [words, jnp.zeros((B, wc - CC // 4), jnp.int32)], axis=1
    )
    owc = -(-(out_cap + 1024) // 4 // 1024) * 1024
    kern = functools.partial(_decode_kernel_v4, cc=CC, owc=owc)
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
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.SMEM((wc,), jnp.int32),
            pltpu.SMEM((owc,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=False,
    )(
        words.reshape(-1),
        jnp.asarray(_tag_lut()),
        comp_lens.astype(jnp.int32),
    )
    ow = ow_flat.reshape(B, owc)
    sh = jnp.arange(4, dtype=jnp.int32) * 8
    by = (
        jax.lax.shift_right_logical(ow[:, :, None], sh[None, None, :]) & 0xFF
    ).reshape(B, owc * 4)
    return by[:, :out_cap], out_lens, errs


def _decode_kernel_v3(words_ref, lut_ref, lens_ref, out_ref,
                      outlen_ref, err_ref, u_smem,
                      sem_in, sem_out, *, cc, wc, owc):
    """v2 + single unified SMEM image (tag words at [0, wc), output
    words at [wc, wc+owc)) so literal and copy share one source ref
    and one fast-path branch; error classification deferred out of
    the loop; first copy pair unrolled."""
    b = pl.program_id(0)
    n = lens_ref[b]
    oc = owc * 4 - 1024
    wcb = wc * 4  # byte base of the output region
    umax = jnp.int32(wc + owc - 1)

    cp_in = pltpu.make_async_copy(
        words_ref.at[pl.ds(b * wc, wc)], u_smem.at[pl.ds(0, wc)], sem_in
    )
    cp_in.start()
    cp_in.wait()

    def rd(i):
        ii = jnp.clip(i, 0, cc - 1)
        return jax.lax.shift_right_logical(
            u_smem[ii >> 2], (ii & 3) * 8
        ) & 0xFF

    def window5(i):
        wi = i >> 2
        sh = (i & 3) * 8
        w0 = u_smem[wi]
        w1 = u_smem[jnp.minimum(wi + 1, wc - 1)]
        lo = jax.lax.shift_right_logical(w0, sh)
        v32 = jnp.where(sh == 0, w0, lo | (w1 << (32 - sh)))
        b4 = jax.lax.shift_right_logical(w1, sh) & 0xFF
        return v32, b4

    def var_body(state):
        i, val, done, err = state
        byte = rd(i)
        val = val | ((byte & 0x7F) << jnp.minimum(7 * i, 28))
        done = byte < 0x80
        err = jnp.where((i == 4) & (byte >= 8), 8, err)
        return i + 1, val, done, err

    def var_cond(state):
        i, val, done, err = state
        return (~done) & (i < 5) & (err == 0)

    pre_len, expected, done, err = jax.lax.while_loop(
        var_cond, var_body, (jnp.int32(0), jnp.int32(0), False, jnp.int32(0))
    )
    err = jnp.where(~done, 8, err)
    err = jnp.where(pre_len > n, 8, err)
    err = jnp.where(expected > oc, 8, err)
    err = jnp.where(expected < 0, 8, err)

    def parse(ip, op):
        v32, b4 = window5(ip)
        d = lut_ref[v32 & 0xFF]
        hdr = d & 7
        is_lit = (d & 8) != 0
        L = (d >> 4) & 0x7F
        extra = (d >> 11) & 7
        rest = jax.lax.shift_right_logical(v32, 8)
        mask = jax.lax.shift_right_logical(jnp.int32(-1), (4 - extra) * 8)
        longlen = (rest & mask) + 1
        longlen = jnp.where((extra == 4) & (b4 > 0), _POISON, longlen)
        length = jnp.where(is_lit & (extra > 0), longlen, L)
        ttype = d >> 25
        off = jnp.where(
            ttype == 1,
            ((d >> 14) & 0x7FF) | (rest & 0xFF),
            jnp.where(
                ttype == 2, rest & 0xFFFF,
                jnp.where(b4 > 0, _POISON, rest),
            ),
        )
        advance = hdr + jnp.where(is_lit, length, 0)
        return hdr, is_lit, length, off, advance

    def sw(i):
        return u_smem[jnp.clip(i, 0, umax)]

    def funnel(lo, hi, a8, hs, hm):
        return jax.lax.shift_right_logical(lo, a8) | ((hi << hs) & hm)

    def append_stream(spos, dst, K):
        rel = spos - dst
        a8 = (rel & 3) * 8
        rw = rel >> 2
        hs = (32 - a8) & 31
        hm = jnp.where(a8 == 0, 0, jnp.int32(-1))
        w0 = dst >> 2
        da8 = (dst & 3) * 8
        lowmask = (1 << da8) - 1
        base = w0 + rw
        prev = sw(base)
        nxt = sw(base + 1)
        sv = funnel(prev, nxt, a8, hs, hm)
        u_smem[w0] = (u_smem[w0] & lowmask) | (sv & ~lowmask)
        nw = ((dst + K - 1) >> 2) - w0

        @pl.when(nw > 0)
        def _():
            n2 = sw(base + 2)
            u_smem[w0 + 1] = funnel(nxt, n2, a8, hs, hm)
            n3 = sw(base + 3)
            u_smem[w0 + 2] = funnel(n2, n3, a8, hs, hm)

            @pl.when(nw > 2)
            def _():
                def cp(k, carry):
                    w = w0 + 3 + 2 * k
                    m1 = sw(w + rw + 1)
                    u_smem[w] = funnel(carry, m1, a8, hs, hm)
                    m2 = sw(w + rw + 2)
                    u_smem[w + 1] = funnel(m1, m2, a8, hs, hm)
                    return m2

                jax.lax.fori_loop(0, (nw - 1) >> 1, cp, n3, unroll=False)

    def append_bytes(spos, dst, K):
        def cpb(k, _):
            q = dst + k
            s = spos + k
            byte = jax.lax.shift_right_logical(
                u_smem[s >> 2], (s & 3) * 8
            ) & 0xFF
            sh = (q & 3) * 8
            w = q >> 2
            u_smem[w] = (u_smem[w] & ~(0xFF << sh)) | (byte << sh)
            return 0

        jax.lax.fori_loop(0, K, cpb, 0, unroll=False)

    def tag_cond(state):
        ip, op, bad = state
        return (ip < n) & ~bad

    def tag_body(state):
        ip, op, bad = state
        hdr, is_lit, length, off, advance = parse(ip, op)
        ok = (
            (ip + advance <= n)
            & (is_lit | ((off > 0) & (off <= op)))
            & (op + length <= expected)
            & (length > 0)
        )

        dst = wcb + op
        spos = jnp.where(is_lit, ip + hdr, dst - off)

        @pl.when(ok & (is_lit | (off >= 8)))
        def _():
            append_stream(spos, dst, length)

        @pl.when(ok & ~is_lit & (off < 8))
        def _():
            head = jnp.minimum(length, 14)
            append_bytes(spos, dst, head)

            @pl.when(length > 14)
            def _():
                off2 = off * (14 // jnp.maximum(off, 1))
                append_stream(dst + 14 - off2, dst + 14, length - 14)

        return (
            jnp.where(ok, ip + advance, ip),
            op + jnp.where(ok, length, 0),
            ~ok,
        )

    ip, op, bad = jax.lax.while_loop(
        tag_cond, tag_body, (pre_len, jnp.int32(0), err != 0)
    )
    # Deferred classification: one re-parse of the failing tag.
    hdr, is_lit, length, off, advance = parse(ip, op)
    e = jnp.where(ip + advance > n, 1, 0)
    e = jnp.where(~is_lit & ((off <= 0) | (off > op)), 2, e)
    e = jnp.where((op + length > expected) | (length < 0), 4, e)
    err = jnp.where(err != 0, err, jnp.where(bad, e, 0))
    err = jnp.where((err == 0) & (op != expected), 4, err)

    outlen_ref[b] = jnp.where(err == 0, expected, 0)
    err_ref[b] = err

    cp_out = pltpu.make_async_copy(
        u_smem.at[pl.ds(wc, owc)], out_ref.at[pl.ds(b * owc, owc)], sem_out
    )
    cp_out.start()
    cp_out.wait()


@functools.partial(jax.jit, static_argnames=("out_cap",))
def decode_v3(comp, comp_lens, out_cap: int = BLOCK_SIZE):
    comp = comp.astype(jnp.int32)
    B, CC = comp.shape
    assert CC % 1024 == 0 and out_cap % 1024 == 0
    words = (
        comp.reshape(B, CC // 4, 4)
        * jnp.array([1, 1 << 8, 1 << 16, 1 << 24], jnp.int32)
    ).sum(axis=2, dtype=jnp.int32)
    wc = -(-(CC // 4) // 1024) * 1024
    words = jnp.concatenate(
        [words, jnp.zeros((B, wc - CC // 4), jnp.int32)], axis=1
    )
    owc = -(-(out_cap + 1024) // 4 // 1024) * 1024
    kern = functools.partial(_decode_kernel_v3, cc=CC, wc=wc, owc=owc)
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
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.SMEM((wc + owc,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=False,
    )(
        words.reshape(-1),
        jnp.asarray(_tag_lut()),
        comp_lens.astype(jnp.int32),
    )
    ow = ow_flat.reshape(B, owc)
    sh = jnp.arange(4, dtype=jnp.int32) * 8
    by = (
        jax.lax.shift_right_logical(ow[:, :, None], sh[None, None, :]) & 0xFF
    ).reshape(B, owc * 4)
    return by[:, :out_cap], out_lens, errs


def _decode_kernel_v1(comp_ref, words_ref, lut_ref, lens_ref, out_ref,
                      outlen_ref, err_ref, buf_smem, words_smem,
                      sem_in, sem_w, sem_out, *, cc, checks, copies):
    b = pl.program_id(0)
    wc = words_smem.shape[0]
    ocp = buf_smem.shape[0] - cc
    oc = ocp - 1024
    n = lens_ref[b]

    cp_in = pltpu.make_async_copy(
        comp_ref.at[pl.ds(b * cc, cc)], buf_smem.at[pl.ds(0, cc)], sem_in
    )
    cp_in.start()
    cp_w = pltpu.make_async_copy(
        words_ref.at[pl.ds(b * wc, wc)], words_smem, sem_w
    )
    cp_w.start()
    cp_in.wait()
    cp_w.wait()

    def rd(i):
        return buf_smem[jnp.clip(i, 0, cc - 1)]

    def window5(i):
        wi = i >> 2
        sh = (i & 3) * 8
        w0 = words_smem[wi]
        w1 = words_smem[jnp.minimum(wi + 1, wc - 1)]
        lo = jax.lax.shift_right_logical(w0, sh)
        v32 = jnp.where(sh == 0, w0, lo | (w1 << (32 - sh)))
        b4 = jax.lax.shift_right_logical(w1, sh) & 0xFF
        return v32, b4

    def var_body(state):
        i, val, done, err = state
        byte = rd(i)
        val = val | ((byte & 0x7F) << jnp.minimum(7 * i, 28))
        done = byte < 0x80
        err = jnp.where((i == 4) & (byte >= 8), 8, err)
        return i + 1, val, done, err

    def var_cond(state):
        i, val, done, err = state
        return (~done) & (i < 5) & (err == 0)

    pre_len, expected, done, err = jax.lax.while_loop(
        var_cond, var_body, (jnp.int32(0), jnp.int32(0), False, jnp.int32(0))
    )
    err = jnp.where(~done, 8, err)
    err = jnp.where(pre_len > n, 8, err)
    err = jnp.where(expected > oc, 8, err)
    err = jnp.where(expected < 0, 8, err)

    def tag_cond(state):
        ip, op, err = state
        return (ip < n) & (err == 0)

    def tag_body(state):
        ip, op, err = state
        v32, b4 = window5(ip)
        tag = v32 & 0xFF
        d = lut_ref[tag]
        hdr = d & 7
        is_lit = (d & 8) != 0
        L = (d >> 4) & 0x7F
        extra = (d >> 11) & 7
        rest = jax.lax.shift_right_logical(v32, 8)

        mask = jax.lax.shift_right_logical(jnp.int32(-1), (4 - extra) * 8)
        longlen = (rest & mask) + 1
        longlen = jnp.where((extra == 4) & (b4 > 0), _POISON, longlen)
        length = jnp.where(is_lit & (extra > 0), longlen, L)

        ttype = d >> 25
        off = jnp.where(
            ttype == 1,
            ((d >> 14) & 0x7FF) | (rest & 0xFF),
            jnp.where(
                ttype == 2,
                rest & 0xFFFF,
                jnp.where(b4 > 0, _POISON, rest),
            ),
        )

        advance = hdr + jnp.where(is_lit, length, 0)
        if checks:
            e = jnp.where(ip + advance > n, 1, 0)
            e = jnp.where(~is_lit & ((off <= 0) | (off > op)), 2, e)
            e = jnp.where((op + length > expected) | (length < 0), 4, e)
            ok = e == 0
        else:
            e = jnp.int32(0)
            ok = True

        if copies:
            # Unified image: literal source in the comp region [0, cc),
            # copy source in the out region [cc, cc+ocp). One address
            # select, one load stream, no per-type branch on the fast
            # path. Sloppy 16-byte copy is correct for literals and for
            # off >= 8 (sequential 8-byte groups); off < 8 is fully
            # rewritten by the byte loop below.
            dst = cc + op
            src = jnp.where(is_lit, ip + hdr, dst - off)
            src = jnp.clip(src, 0, cc + ocp - 17)
            for u in range(16):
                buf_smem[dst + u] = buf_smem[src + u]

            @pl.when(ok & (length > 16) & (is_lit | (off >= 8)))
            def _():
                chunks = (length + 7) // 8

                def cp(k, _):
                    base = dst + k * 8
                    sb = src + k * 8
                    for u in range(8):
                        buf_smem[base + u] = buf_smem[sb + u]
                    return 0

                jax.lax.fori_loop(2, chunks, cp, 0, unroll=False)

            @pl.when(ok & ~is_lit & (off < 8))
            def _():
                def cpb(k, _):
                    buf_smem[dst + k] = buf_smem[src + k]
                    return 0

                jax.lax.fori_loop(0, length, cpb, 0, unroll=False)

        return ip + advance, op + jnp.where(ok, length, 0), e

    ip, op, err = jax.lax.while_loop(
        tag_cond, tag_body, (pre_len, jnp.int32(0), err)
    )
    err = jnp.where((err == 0) & (op != expected), 4, err)

    outlen_ref[b] = jnp.where(err == 0, expected, 0)
    err_ref[b] = err

    cp_out = pltpu.make_async_copy(
        buf_smem.at[pl.ds(cc, ocp)], out_ref.at[pl.ds(b * ocp, ocp)], sem_out
    )
    cp_out.start()
    cp_out.wait()


@functools.partial(jax.jit, static_argnames=("out_cap", "variant"))
def decode_variant(comp, comp_lens, out_cap: int = BLOCK_SIZE,
                   variant: str = "v1"):
    comp = comp.astype(jnp.int32)
    B, CC = comp.shape
    assert CC % 1024 == 0 and out_cap % 1024 == 0
    ocp = out_cap + 1024
    words = (
        comp.reshape(B, CC // 4, 4)
        * jnp.array([1, 1 << 8, 1 << 16, 1 << 24], jnp.int32)
    ).sum(axis=2, dtype=jnp.int32)
    wc = -(-(CC // 4) // 1024) * 1024
    words = jnp.concatenate(
        [words, jnp.zeros((B, wc - CC // 4), jnp.int32)], axis=1
    )
    kern = functools.partial(
        _decode_kernel_v1,
        cc=CC,
        checks="nock" not in variant,
        copies="nocp" not in variant,
    )
    out_flat, out_lens, errs = pl.pallas_call(
        kern,
        grid=(B,),
        out_shape=(
            jax.ShapeDtypeStruct((B * ocp,), jnp.int32),
            jax.ShapeDtypeStruct((B,), jnp.int32),
            jax.ShapeDtypeStruct((B,), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.SMEM((CC + ocp,), jnp.int32),
            pltpu.SMEM((wc,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=False,
    )(
        comp.reshape(-1),
        words.reshape(-1),
        jnp.asarray(_tag_lut()),
        comp_lens.astype(jnp.int32),
    )
    return out_flat.reshape(B, ocp)[:, :out_cap], out_lens, errs


# ---------------------------------------------------------------------------
# Harness
# ---------------------------------------------------------------------------


def build_blocks(B=128):
    html = pathlib.Path(
        "/root/reference/Snappier.Tests/TestData/html"
    ).read_bytes()
    reps = -(-B * BLOCK_SIZE // len(html))
    tiled = (html * reps)[: B * BLOCK_SIZE]
    frags = np.frombuffer(tiled, np.uint8).reshape(B, BLOCK_SIZE)
    from snappier_tpu.format import oracle
    from snappier_tpu.format.varint import read_varint

    blocks_l = [bytes(oracle.compress(frags[i])) for i in range(B)]
    lens = np.array([len(x) for x in blocks_l], np.int32)
    cap = -(-int(lens.max()) // 1024) * 1024
    comp = np.zeros((B, cap), np.int32)
    for i, x in enumerate(blocks_l):
        comp[i, : len(x)] = np.frombuffer(x, np.uint8)
    # tag count of block 0 for per-tag accounting
    body = blocks_l[0]
    _, pos = read_varint(np.frombuffer(body, np.uint8))
    ntags = 0
    lit_hist = {"le16": 0, "gt16": 0, "copy_le16": 0, "copy_gt16": 0,
                "off_lt8": 0}
    while pos < len(body):
        t = body[pos]
        tt = t & 3
        if tt == 0:
            l6 = t >> 2
            if l6 < 60:
                ln = l6 + 1
                pos += 1 + ln
            else:
                e = l6 - 59
                ln = int.from_bytes(body[pos + 1 : pos + 1 + e], "little") + 1
                pos += 1 + e + ln
            lit_hist["le16" if ln <= 16 else "gt16"] += 1
        else:
            if tt == 1:
                ln = ((t >> 2) & 7) + 4
                off = ((t >> 5) << 8) | body[pos + 1]
                pos += 2
            elif tt == 2:
                ln = (t >> 2) + 1
                off = int.from_bytes(body[pos + 1 : pos + 3], "little")
                pos += 3
            else:
                ln = (t >> 2) + 1
                off = int.from_bytes(body[pos + 1 : pos + 5], "little")
                pos += 5
            lit_hist["copy_le16" if ln <= 16 else "copy_gt16"] += 1
            if off < 8:
                lit_hist["off_lt8"] += 1
        ntags += 1
    return frags, comp, lens, ntags, lit_hist


def timeit(fn, iters=5, passes=3):
    np.asarray(jax.tree.leaves(fn())[1])
    best = float("inf")
    for _ in range(passes):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn()
        np.asarray(jax.tree.leaves(r)[1])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    variants = sys.argv[1:] or ["v0", "v1", "v1nock", "v1nocp"]
    B = 128
    frags, comp, lens, ntags, hist = build_blocks(B)
    comp_d = jax.device_put(jnp.asarray(comp))
    lens_d = jax.device_put(jnp.asarray(lens))
    gb = B * BLOCK_SIZE / 1e9
    print(f"B={B} blocks, {ntags} tags/block, mix={hist}")

    for v in variants:
        if v == "v0":
            from snappier_tpu.ops.pallas.scalar_codec import (
                decode_blocks_scalar,
            )

            fn = lambda: decode_blocks_scalar(
                comp_d, lens_d, out_cap=BLOCK_SIZE, interpret=False
            )
        elif v == "v2":
            fn = functools.partial(decode_v2, comp_d, lens_d, BLOCK_SIZE)
        elif v == "v3":
            fn = functools.partial(decode_v3, comp_d, lens_d, BLOCK_SIZE)
        elif v == "v4":
            fn = functools.partial(decode_v4, comp_d, lens_d, BLOCK_SIZE)
        else:
            fn = functools.partial(
                decode_variant, comp_d, lens_d, BLOCK_SIZE, v
            )
        outs, out_lens, errs = fn()
        errs_h = np.asarray(errs)
        full = "nocp" not in v
        ok = int(errs_h.max()) == 0 and (
            not full
            or (
                (np.asarray(outs[0])[:BLOCK_SIZE] == frags[0]).all()
                and (np.asarray(outs[B - 1])[:BLOCK_SIZE] == frags[B - 1]).all()
            )
        )
        t = timeit(fn)
        per_block = t / B
        print(
            f"{v}: {'OK ' if ok else 'BAD'} {t*1e3:.2f} ms total, "
            f"{per_block*1e6:.0f} us/block, {gb/t:.3f} GB/s, "
            f"{per_block/ntags*1e9:.0f} ns/tag",
            flush=True,
        )


if __name__ == "__main__":
    main()
