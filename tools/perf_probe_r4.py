"""Round-4 kernel ablation probes (run on the real TPU chip).

Decode: the round-3 walk measured 91.6 ns/tag against an ~82 ns op
model — the gap is load-use serialization in the per-tag chain
(tag load -> LUT loads -> field unpack -> branch). Variant ``pipe``
software-pipelines the walk: the NEXT tag's five loads (window, 3
LUTs, extra-byte window) issue right after the current tag's advance
is known, BEFORE the current tag's payload stores, so their latency
hides under store work; the loop carries the preloaded values.

Encode: the scan loop pays one while-backedge + one lax.cond per
3-byte miss advance. Variant ``enc2x`` probes two sequential
quad-groups per iteration (same probe semantics, same candidates) so
the backedge amortizes over 6 bytes.

Each variant is a self-contained copy of the production kernel with
only the walk restructured; correctness is asserted against the
production kernel's output every run. Timing methodology = bench.py
(device-resident args, host fetch as barrier, best-of-N).

Usage: python tools/perf_probe_r4.py [B] [variants...]
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

jax.config.update(
    "jax_compilation_cache_dir",
    str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache_tpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from snappier_tpu.constants import BLOCK_SIZE
from snappier_tpu.ops.decode import ERR_BAD_PREAMBLE
from snappier_tpu.ops.pallas.scalar_codec import (
    _POISON,
    _ERR_MALFORMED,
    _keys_from_frags,
    decode_blocks_scalar,
    encode_blocks_scalar,
)


@functools.cache
def _tag_luts():
    """Round-3 LUT layout (is-literal at bit 3, wide-literal poison at
    bit 31) — the `pipe` variant's kernel predates the round-4
    production relayout, so it keeps a frozen copy here."""
    import numpy as _np

    d = _np.zeros(256, _np.int32)
    lm = _np.zeros(256, _np.int32)
    om = _np.zeros(256, _np.int32)
    for t in range(256):
        tt = t & 3
        l6 = t >> 2
        wide = 0
        if tt == 0:
            is_lit, offhi = 1, 0
            if l6 < 60:
                hdr, base = 1, l6 + 1
            else:
                extra = l6 - 59
                hdr, base = 1 + extra, 1
                lm[t] = (1 << (8 * min(extra, 3))) - 1
                wide = 1 if extra == 4 else 0
        elif tt == 1:
            hdr, base, is_lit, offhi = 2, ((t >> 2) & 7) + 4, 0, (t >> 5) << 8
            om[t] = 0xFF
        elif tt == 2:
            hdr, base, is_lit, offhi = 3, l6 + 1, 0, 0
            om[t] = 0xFFFF
        else:
            hdr, base, is_lit, offhi = 5, l6 + 1, 0, 0
            om[t] = -1
        v = hdr | (is_lit << 3) | (base << 4) | (offhi << 14) | (wide << 31)
        d[t] = v - (1 << 32) if v & (1 << 31) else v
    return d, lm, om


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


# --------------------------------------------------------------------------
# Pipelined decode variant
# --------------------------------------------------------------------------


def _decode_kernel_pipe(keys_ref, lut_ref, lm_ref, om_ref, lens_ref, out_ref,
                        outlen_ref, err_ref, key_smem, ow_smem,
                        sem_in, sem_out, *, cc, out_cap):
    b = pl.program_id(0)
    kc = key_smem.shape[0]
    owc = ow_smem.shape[0]
    n = lens_ref[b]

    cp_in = pltpu.make_async_copy(
        keys_ref.at[pl.ds(b * kc, kc)], key_smem, sem_in
    )
    cp_in.start()
    cp_in.wait()

    def rd(i):
        return key_smem[jnp.clip(i, 0, cc - 1)] & 0xFF

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
    err = jnp.where(expected > out_cap, ERR_BAD_PREAMBLE, err)
    err = jnp.where(expected < 0, ERR_BAD_PREAMBLE, err)

    def funnel(lo, hi, a8, hs2):
        return jax.lax.shift_right_logical(lo, a8) | ((hi << 1) << hs2)

    def append_lit(spos, op, K):
        w0 = op >> 2
        da8 = (op & 3) * 8
        lowmask = (1 << da8) - 1
        ow_smem[w0] = (ow_smem[w0] & lowmask) | (key_smem[spos] << da8)
        s1 = spos + 4 - (op & 3)
        nw = ((op + K - 1) >> 2) - w0

        @pl.when(nw > 0)
        def _():
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

                    jax.lax.fori_loop(0, (nw - 1) >> 2, cp, 0, unroll=False)

    def append_stream(spos, op, K):
        rel = spos - op
        a8 = (rel & 3) * 8
        rw = rel >> 2
        hs2 = 31 - a8
        w0 = op >> 2
        da8 = (op & 3) * 8
        lowmask = (1 << da8) - 1

        def sw(i):
            return ow_smem[i]

        base = w0 + rw
        prev = sw(jnp.maximum(base, 0))
        nxt = sw(base + 1)
        sv = funnel(prev, nxt, a8, hs2)
        ow_smem[w0] = (ow_smem[w0] & lowmask) | (sv & ~lowmask)
        nw = ((op + K - 1) >> 2) - w0

        @pl.when(nw > 0)
        def _():
            n2 = sw(base + 2)
            ow_smem[w0 + 1] = funnel(nxt, n2, a8, hs2)
            n3 = sw(base + 3)
            ow_smem[w0 + 2] = funnel(n2, n3, a8, hs2)

            @pl.when(nw > 2)
            def _():
                n4 = sw(base + 4)
                ow_smem[w0 + 3] = funnel(n3, n4, a8, hs2)
                n5 = sw(base + 5)
                ow_smem[w0 + 4] = funnel(n4, n5, a8, hs2)

                @pl.when(nw > 4)
                def _():
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

                    jax.lax.fori_loop(0, (nw - 1) >> 2, cp, n5, unroll=False)

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

    # ---- software-pipelined tag walk ----------------------------------
    guard = cc - 1  # preload index clamp (speculative next-tag loads)

    def load_tag(ip):
        w = key_smem[ip]
        tag = w & 0xFF
        return lut_ref[tag], lm_ref[tag], om_ref[tag], key_smem[ip + 1]

    d0, lm0, om0, rest0 = load_tag(jnp.minimum(pre_len, guard))

    def tag_cond(state):
        ip, op, err, d, lm, om, rest = state
        return (ip < n) & (err == 0)

    def tag_body(state):
        ip, op, err, d, lm, om, rest = state
        hdr = d & 7
        is_lit = (d & 8) != 0
        length = (rest & lm) + ((d >> 4) & 0x7F)
        off = (rest & om) | ((d >> 14) & 0x7FF)
        length = jnp.where(
            (d < 0) & (jax.lax.shift_right_logical(rest, 24) != 0),
            _POISON, length,
        )
        advance = hdr + jnp.where(is_lit, length, 0)
        ip2 = ip + advance
        # Preload the NEXT tag before this tag's payload stores: the
        # five loads' latency hides under the store work.
        d2, lm2, om2, rest2 = load_tag(jnp.minimum(ip2, guard))

        bad = (ip2 > n) | (op + length > expected)
        bad = bad | (~is_lit & ((off <= 0) | (off > op)))
        e = jnp.where(bad, _ERR_MALFORMED, 0)
        ok = ~bad

        @pl.when(ok & is_lit)
        def _():
            append_lit(ip + hdr, op, length)

        @pl.when(ok & ~is_lit & (off >= 8))
        def _():
            append_stream(op - off, op, length)

        @pl.when(ok & ~is_lit & (off < 8))
        def _():
            head = jnp.minimum(length, 14)
            append_bytes(op - off, op, head)

            @pl.when(length > 14)
            def _():
                off2 = off * (14 // jnp.maximum(off, 1))
                append_stream(op + 14 - off2, op + 14, length - 14)

        return ip2, op + length, e, d2, lm2, om2, rest2

    ip, op, err, _, _, _, _ = jax.lax.while_loop(
        tag_cond, tag_body, (pre_len, jnp.int32(0), err, d0, lm0, om0, rest0)
    )
    from snappier_tpu.ops.decode import ERR_LENGTH_MISMATCH

    err = jnp.where((err == 0) & (op != expected), ERR_LENGTH_MISMATCH, err)
    outlen_ref[b] = jnp.where(err == 0, expected, 0)
    err_ref[b] = err

    cp_out = pltpu.make_async_copy(
        ow_smem, out_ref.at[pl.ds(b * owc, owc)], sem_out
    )
    cp_out.start()
    cp_out.wait()


@functools.partial(jax.jit, static_argnames=("out_cap",))
def decode_pipe(comp, comp_lens, out_cap: int = BLOCK_SIZE):
    comp = comp.astype(jnp.int32)
    B, CC = comp.shape
    assert CC % 1024 == 0 and out_cap % 1024 == 0
    keys = _keys_from_frags(comp)[:, : CC + 1024]
    kc = CC + 1024
    owc = -(-(out_cap + 1024) // 4 // 1024) * 1024
    kern = functools.partial(_decode_kernel_pipe, cc=CC, out_cap=out_cap)
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
            pltpu.SMEM((kc,), jnp.int32),
            pltpu.SMEM((owc,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=False,
    )(
        keys.reshape(-1),
        *(jnp.asarray(a) for a in _tag_luts()),
        comp_lens.astype(jnp.int32),
    )
    ow = ow_flat.reshape(B, owc)
    sh = jnp.arange(4, dtype=jnp.int32) * 8
    by = (
        jax.lax.shift_right_logical(ow[:, :, None], sh[None, None, :]) & 0xFF
    ).reshape(B, owc * 4)
    return by[:, :out_cap], out_lens, errs


# --------------------------------------------------------------------------
# pipe2: op-trimmed + software-pipelined + optionally 2-tag-unrolled walk
# --------------------------------------------------------------------------
#
# Trims vs production:
#  * err folded into ip: a bad tag sets ip to a sentinel > n, so the
#    loop cond is just (ip < n) and err is reconstructed post-loop
#    (clean termination lands ip exactly on n).
#  * is_lit moves to d's sign bit (1 op instead of mask+compare).
#  * the 4-extra-byte literal poison (shift+cmp+and+where) is replaced
#    by lm[extra4] = -1: length = rest + 1, so a nonzero 4th byte makes
#    length either >= 2^24 (fails op+length > expected) or negative
#    (new explicit length < 0 term) — same strict-reject semantics.
#  * unroll=2 processes two tags per backedge; the second tag is
#    neutralized branchlessly when the first ends the stream.

import functools as _ft


@_ft.cache
def _tag_luts2():
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
                lm[t] = (1 << (8 * extra)) - 1 if extra < 4 else -1
        elif tt == 1:
            hdr, base, is_lit, offhi = 2, ((t >> 2) & 7) + 4, 0, (t >> 5) << 8
            om[t] = 0xFF
        elif tt == 2:
            hdr, base, is_lit, offhi = 3, l6 + 1, 0, 0
            om[t] = 0xFFFF
        else:
            hdr, base, is_lit, offhi = 5, l6 + 1, 0, 0
            om[t] = -1
        d[t] = hdr | (base << 4) | (offhi << 14) | (is_lit << 31)
    to32 = lambda a: ((a + (1 << 31)) % (1 << 32) - (1 << 31)).astype(
        _np.int32
    )
    return to32(d), to32(lm), to32(om)


_SENT = 0x40000000  # bad-tag ip sentinel (> any n, traces as a literal)


def _decode_kernel_pipe2(keys_ref, lut_ref, lm_ref, om_ref, lens_ref,
                         out_ref, outlen_ref, err_ref, key_smem, ow_smem,
                         sem_in, sem_out, *, cc, out_cap, unroll, emit=True,
                         unc=False, dma_pipe=False):
    b = pl.program_id(0)
    kc = key_smem.shape[0]
    owc = ow_smem.shape[0]
    n = lens_ref[b]

    cp_in = pltpu.make_async_copy(
        keys_ref.at[pl.ds(b * kc, kc)], key_smem, sem_in
    )
    cp_in.start()
    if dma_pipe:
        # Program b-1's output copy drains while our input DMA flies;
        # we only need ow_smem free before the walk's first store.
        @pl.when(b > 0)
        def _():
            pltpu.make_async_copy(
                ow_smem, out_ref.at[pl.ds((b - 1) * owc, owc)], sem_out
            ).wait()
    cp_in.wait()

    def rd(i):
        return key_smem[jnp.clip(i, 0, cc - 1)] & 0xFF

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

    pre_len, expected, done, err0 = jax.lax.while_loop(
        var_cond, var_body, (jnp.int32(0), jnp.int32(0), False, jnp.int32(0))
    )
    err0 = jnp.where(~done, ERR_BAD_PREAMBLE, err0)
    err0 = jnp.where(pre_len > n, ERR_BAD_PREAMBLE, err0)
    err0 = jnp.where(expected > out_cap, ERR_BAD_PREAMBLE, err0)
    err0 = jnp.where(expected < 0, ERR_BAD_PREAMBLE, err0)

    def funnel(lo, hi, a8, hs2):
        return jax.lax.shift_right_logical(lo, a8) | ((hi << 1) << hs2)

    def append_lit(spos, op, K):
        w0 = op >> 2
        da8 = (op & 3) * 8
        lowmask = (1 << da8) - 1
        ow_smem[w0] = (ow_smem[w0] & lowmask) | (key_smem[spos] << da8)
        s1 = spos + 4 - (op & 3)
        nw = ((op + K - 1) >> 2) - w0

        def tail_tiers():
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

                    jax.lax.fori_loop(0, (nw - 1) >> 2, cp, 0, unroll=False)

        if unc:
            # Unconditional first pair: over-stores past the frontier
            # are garbage-until-overwritten (standing contract); kills
            # the nw>0 branch on every literal.
            ow_smem[w0 + 1] = key_smem[s1]
            ow_smem[w0 + 2] = key_smem[s1 + 4]
            tail_tiers()
        else:
            @pl.when(nw > 0)
            def _():
                ow_smem[w0 + 1] = key_smem[s1]
                ow_smem[w0 + 2] = key_smem[s1 + 4]
                tail_tiers()

    def append_stream(spos, op, K):
        rel = spos - op
        a8 = (rel & 3) * 8
        rw = rel >> 2
        hs2 = 31 - a8
        w0 = op >> 2
        da8 = (op & 3) * 8
        lowmask = (1 << da8) - 1

        def sw(i):
            return ow_smem[i]

        base = w0 + rw
        prev = sw(jnp.maximum(base, 0))
        nxt = sw(base + 1)
        sv = funnel(prev, nxt, a8, hs2)
        ow_smem[w0] = (ow_smem[w0] & lowmask) | (sv & ~lowmask)
        nw = ((op + K - 1) >> 2) - w0

        if unc:
            n2 = sw(base + 2)
            ow_smem[w0 + 1] = funnel(nxt, n2, a8, hs2)
            n3 = sw(base + 3)
            ow_smem[w0 + 2] = funnel(n2, n3, a8, hs2)

            def pair2():
                n4 = sw(base + 4)
                ow_smem[w0 + 3] = funnel(n3, n4, a8, hs2)
                n5 = sw(base + 5)
                ow_smem[w0 + 4] = funnel(n4, n5, a8, hs2)

                @pl.when(nw > 4)
                def _():
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

                    jax.lax.fori_loop(
                        0, (nw - 1) >> 2, cp, n5, unroll=False
                    )

            if unc == 2:
                # avg copy is ~15.5 B (nw ~ 4): run the second pair
                # unconditionally too — reads reach <= 3 words past
                # the frontier (garbage region, legal) and stores land
                # in slack.
                pair2()
            else:
                @pl.when(nw > 2)
                def _():
                    pair2()
        else:
            @pl.when(nw > 0)
            def _():
                n2 = sw(base + 2)
                ow_smem[w0 + 1] = funnel(nxt, n2, a8, hs2)
                n3 = sw(base + 3)
                ow_smem[w0 + 2] = funnel(n2, n3, a8, hs2)

                @pl.when(nw > 2)
                def _():
                    n4 = sw(base + 4)
                    ow_smem[w0 + 3] = funnel(n3, n4, a8, hs2)
                    n5 = sw(base + 5)
                    ow_smem[w0 + 4] = funnel(n4, n5, a8, hs2)

                    @pl.when(nw > 4)
                    def _():
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

                        jax.lax.fori_loop(
                            0, (nw - 1) >> 2, cp, n5, unroll=False
                        )

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

    guard = cc - 1

    def load_tag(ip):
        w = key_smem[ip]
        tag = w & 0xFF
        return lut_ref[tag], lm_ref[tag], om_ref[tag], key_smem[ip + 1]

    def one_tag(st):
        """Process the tag whose preloaded descriptors ride in st;
        returns the next state (with the NEXT tag preloaded)."""
        ip, op, d, lm, om, rest = st
        hdr = d & 7
        is_lit = d < 0
        length = (rest & lm) + ((d >> 4) & 0x7F)
        off = (rest & om) | ((d >> 14) & 0x7FF)
        advance = hdr + jnp.where(is_lit, length, 0)
        ip2 = ip + advance
        d2, lm2, om2, rest2 = load_tag(jnp.clip(ip2, 0, guard))

        bad = (ip2 > n) | (length < 0) | (op + length > expected)
        bad = bad | (~is_lit & ((off <= 0) | (off > op)))
        ok = (~bad) & (ip < n)

        if emit:
            @pl.when(ok & is_lit)
            def _():
                append_lit(ip + hdr, op, length)

            @pl.when(ok & ~is_lit & (off >= 8))
            def _():
                append_stream(op - off, op, length)

            @pl.when(ok & ~is_lit & (off < 8))
            def _():
                head = jnp.minimum(length, 14)
                append_bytes(op - off, op, head)

                @pl.when(length > 14)
                def _():
                    off2 = off * (14 // jnp.maximum(off, 1))
                    append_stream(op + 14 - off2, op + 14, length - 14)

        ip3 = jnp.where(bad, _SENT, ip2)
        ip3 = jnp.where(ip >= n, ip, ip3)  # second-slot neutralization
        op3 = jnp.where(ok, op + length, op)
        return ip3, op3, d2, lm2, om2, rest2

    def tag_cond(st):
        return st[0] < n

    def tag_body(st):
        for _ in range(unroll):
            st = one_tag(st)
        return st

    ip0 = jnp.where(err0 == 0, pre_len, _SENT)
    d0, lm0, om0, rest0 = load_tag(jnp.clip(ip0, 0, guard))
    ip, op, _, _, _, _ = jax.lax.while_loop(
        tag_cond, tag_body, (ip0, jnp.int32(0), d0, lm0, om0, rest0)
    )
    from snappier_tpu.ops.decode import ERR_LENGTH_MISMATCH

    err = jnp.where(ip != n, _ERR_MALFORMED, 0)
    err = jnp.where((err == 0) & (op != expected), ERR_LENGTH_MISMATCH, err)
    err = jnp.where(err0 != 0, err0, err)
    outlen_ref[b] = jnp.where(err == 0, expected, 0)
    err_ref[b] = err

    cp_out = pltpu.make_async_copy(
        ow_smem, out_ref.at[pl.ds(b * owc, owc)], sem_out
    )
    cp_out.start()
    if dma_pipe:
        @pl.when(b == pl.num_programs(0) - 1)
        def _():
            cp_out.wait()
    else:
        cp_out.wait()


@functools.partial(
    jax.jit, static_argnames=("out_cap", "unroll", "emit", "unc", "dma_pipe")
)
def decode_pipe2(comp, comp_lens, out_cap: int = BLOCK_SIZE, unroll: int = 1,
                 emit: bool = True, unc: bool = False,
                 dma_pipe: bool = False):
    comp = comp.astype(jnp.int32)
    B, CC = comp.shape
    assert CC % 1024 == 0 and out_cap % 1024 == 0
    keys = _keys_from_frags(comp)[:, : CC + 1024]
    kc = CC + 1024
    owc = -(-(out_cap + 1024) // 4 // 1024) * 1024
    kern = functools.partial(
        _decode_kernel_pipe2, cc=CC, out_cap=out_cap, unroll=unroll,
        emit=emit, unc=unc, dma_pipe=dma_pipe,
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
            pltpu.SMEM((kc,), jnp.int32),
            pltpu.SMEM((owc,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=False,
    )(
        keys.reshape(-1),
        *(jnp.asarray(a) for a in _tag_luts2()),
        comp_lens.astype(jnp.int32),
    )
    ow = ow_flat.reshape(B, owc)
    sh = jnp.arange(4, dtype=jnp.int32) * 8
    by = (
        jax.lax.shift_right_logical(ow[:, :, None], sh[None, None, :]) & 0xFF
    ).reshape(B, owc * 4)
    return by[:, :out_cap], out_lens, errs


# --------------------------------------------------------------------------
# Encoder probes
# --------------------------------------------------------------------------
#
# encpre: speculative software pipelining of the scan loop — the next
# MISS position's 4 keys + 4 hashes load before this group's
# table-entry resolution and branch, so their latency hides under the
# ~25-op resolve chain. A hit wastes the 8 preloads (hits are ~15% of
# iterations on html) and reloads at its landing position inside
# on_hit. encnoemit: production walk with all emission removed — the
# walk/extension vs emission split for the round-4 budget table.

# encext8: stride-8 extension walk — encstats shows ext iterations
# dominate the walk (14407/block vs 725 miss + 3138 hit probes on
# html, avg match 19.5 B), so halving the extension backedges is the
# big lever. Seeding drops to one entry per 8 matched bytes (avg ~2.4
# entries/match, still >= the reference's 2/match) — output is NOT
# byte-identical to production, so the harness validates by decoding.
#
# enctrim: probe-iteration op trim — (a) epoch check fused into one
# unsigned compare (entry - epoch <u ip+d covers stale-epoch, bounds,
# and self-reference at once), (b) candidate selection (10 wheres)
# deferred into the hit branch so the ~85% miss iterations skip it.
#
# encfull: both.

from snappier_tpu.ops.pallas.scalar_codec import _HASH_BITS, _HASH_MUL


def _encode_kernel_r4(keys_ref, hashes_ref, lens_ref, out_ref, outlen_ref,
                      key_smem, hash_smem, out_smem, table_smem, hold_smem,
                      sem_in, sem_hash, sem_out, *, variant,
                      hash_bits=_HASH_BITS, skip_base=32):
    b = pl.program_id(0)
    fc = key_smem.shape[0]
    oc = out_smem.shape[0]
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
        return key_smem[i]

    def key_v(i):
        return key_smem[jnp.minimum(i, fc - 1)]

    epoch = ((b & 0x7FFF) + 1) << 16
    emit = variant != "encnoemit"

    if variant == "encdmaonly":
        # DMA + dispatch share: the walk removed entirely.
        outlen_ref[b] = n
        cp_out = pltpu.make_async_copy(
            out_smem, out_ref.at[pl.ds(b * oc, oc)], sem_out
        )
        cp_out.start()
        cp_out.wait()
        return

    def tag3(p, tagword):
        w = p >> 2
        da8 = (p & 3) * 8
        out_smem[w] = (out_smem[w] & ((1 << da8) - 1)) | (tagword << da8)
        out_smem[w + 1] = jax.lax.shift_right_logical(
            jax.lax.shift_right_logical(tagword, 1), 31 - da8
        )

    def emit_literal_stores(op, lit_start, llen):
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
        nw = ((q + llen - 1) >> 2) - w0

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

                    jax.lax.fori_loop(0, (nw - 1) >> 2, cp, 0, unroll=False)

    def emit_literal_checked(op, lit_start, lit_end):
        llen = lit_end - lit_start
        if emit:
            @pl.when(llen > 0)
            def _():
                emit_literal_stores(op, lit_start, llen)

        extra = jnp.where(llen > 256, 2, jnp.where(llen > 60, 1, 0))
        return op + jnp.where(llen > 0, 1 + extra + llen, 0)

    def emit_copy_upto64(op, off, length):
        is1 = (length <= 11) & (off < 2048)
        if emit:
            b0 = jnp.where(
                is1,
                1 | ((length - 4) << 2) | ((off >> 8) << 5),
                2 | ((length - 1) << 2),
            )
            tag3(op, b0 | ((off & 0xFF) << 8) | (((off >> 8) & 0xFF) << 16))
        return op + jnp.where(is1, 2, 3)

    copywhen = variant in ("enccopywhen", "encr4")

    def emit_copy(op, off, length):
        def big_cond(st):
            op, length = st
            return length >= 68

        def big_body(st):
            op, length = st
            return emit_copy_upto64(op, off, 64), length - 64

        if copywhen:
            # The >= 68 loop runs for ~0 copies on typical data (avg
            # match 19.5 B) but its data-dependent entry costs ~20 ns
            # per hit; gate the whole repeated-64 emission behind a
            # ~3-cycle pl.when and carry the common case's op/length
            # through a select. The loop's state flows out through
            # hold cells (pl.when is statement-level).
            @pl.when(length >= 68)
            def _():
                op_l, len_l = jax.lax.while_loop(
                    big_cond, big_body, (op, length)
                )
                hold_smem[2] = op_l
                hold_smem[3] = len_l

            big = length >= 68
            op = jnp.where(big, hold_smem[2], op)
            length = jnp.where(big, hold_smem[3], length)
        else:
            op, length = jax.lax.while_loop(big_cond, big_body, (op, length))
        is_split = length > 64
        l1 = jnp.where(is_split, 60, length)
        op1 = emit_copy_upto64(op, off, l1)
        op2 = emit_copy_upto64(op1, off, jnp.maximum(length - 60, 4))
        return jnp.where(is_split, op2, op1)

    margin = 15
    ext_mode = (
        "ext8" if variant in ("encext8", "encfull")
        else "ext8u" if variant in ("encext8u", "encwhen8", "encr4",
                                    "encoct8")
        else "ext8s2" if variant == "encext8s2"
        else "ext16u" if variant == "encext16u"
        else "ext4"
    )
    trim = variant in ("enctrim", "encfull", "encwhen", "encwhen8")

    def ext_and_emit(at, cand, lit_start, op):
        if ext_mode == "ext8":
            def ext_body(st):
                m, _ = st
                p = jnp.minimum(at + m - 3, n - 5)
                table_smem[hash_smem[p]] = epoch | p
                eq0 = key(at + m) == key(cand + m)
                eq1 = key(at + m + 4) == key(cand + m + 4)
                return m + jnp.where(eq0, jnp.where(eq1, 8, 4), 0), eq0 & eq1

            def ext_cond(st):
                m, go = st
                return go & (at + m + 8 <= n)

            m, go = jax.lax.while_loop(
                ext_cond, ext_body, (jnp.int32(4), True)
            )
            # go False: m points at the mismatching group (no overshoot
            # by construction). go True (bounds): at most one stride-4
            # group remains.
            can4 = go & (at + m + 4 <= n) & (key(at + m) == key(cand + m))
            m = m + jnp.where(can4, 4, 0)
        elif ext_mode in ("ext8u", "ext8s2"):
            # UNCONDITIONAL m += 8 (the encext8 failure analysis: a
            # data-dependent advance chains next-m on this group's
            # compares, doubling per-iteration latency; here the
            # compares feed only the loop condition, exactly like the
            # production stride-4 walk, and the exit backs up from the
            # carried eq bits). ext8s2 seeds TWO table entries per
            # backedge — the same per-4-byte seeding density as the
            # stride-4 walk (stores are off the critical path).
            two_seeds = ext_mode == "ext8s2"

            def ext_body(st):
                m, _, _ = st
                p = jnp.minimum(at + m - 3, n - 5)
                table_smem[hash_smem[p]] = epoch | p
                if two_seeds:
                    p2 = jnp.minimum(at + m + 1, n - 5)
                    table_smem[hash_smem[p2]] = epoch | p2
                eq0 = key(at + m) == key(cand + m)
                eq1 = key(at + m + 4) == key(cand + m + 4)
                return m + 8, eq0 & eq1, eq0

            def ext_cond(st):
                m, go, _ = st
                return go & (at + m + 8 <= n)

            m, go, eq0l = jax.lax.while_loop(
                ext_cond, ext_body, (jnp.int32(4), True, True)
            )
            m = jnp.where(go, m, m - 8 + jnp.where(eq0l, 4, 0))
            can4 = go & (at + m + 4 <= n) & (key(at + m) == key(cand + m))
            m = m + jnp.where(can4, 4, 0)
        elif ext_mode == "ext16u":
            def ext_body(st):
                m = st[0]
                p = jnp.minimum(at + m - 3, n - 5)
                table_smem[hash_smem[p]] = epoch | p
                p2 = jnp.minimum(at + m + 5, n - 5)
                table_smem[hash_smem[p2]] = epoch | p2
                eqs = [
                    key(at + m + 4 * i) == key(cand + m + 4 * i)
                    for i in range(4)
                ]
                e01 = eqs[0] & eqs[1]
                e012 = e01 & eqs[2]
                return m + 16, e012 & eqs[3], eqs[0], e01, e012

            def ext_cond(st):
                return st[1] & (at + st[0] + 16 <= n)

            m16, go, e0, e01, e012 = jax.lax.while_loop(
                ext_cond, ext_body,
                (jnp.int32(4), True, True, True, True),
            )
            lead = (
                jnp.where(e0, 4, 0)
                + jnp.where(e01, 4, 0)
                + jnp.where(e012, 4, 0)
            )
            mismatch_m = m16 - 16 + lead
            # Bounds exit: up to 3 stride-4 groups remain.
            def fin_body(st2):
                m2, _ = st2
                return m2 + 4, key(at + m2) == key(cand + m2)

            def fin_cond(st2):
                m2, go2 = st2
                return go2 & (at + m2 + 4 <= n)

            m2, go2 = jax.lax.while_loop(fin_cond, fin_body, (m16, go))
            fin_m = jnp.where(go2, m2, m2 - 4)
            m = jnp.where(go, fin_m, mismatch_m)
        else:
            def ext_body(st):
                m, _ = st
                p = jnp.minimum(at + m - 3, n - 5)
                table_smem[hash_smem[p]] = epoch | p
                return m + 4, key(at + m) == key(cand + m)

            def ext_cond(st):
                m, go = st
                return go & (at + m + 4 <= n)

            m, go = jax.lax.while_loop(
                ext_cond, ext_body, (jnp.int32(4), True)
            )
            m = jnp.where(go, m, m - 4)
        x = key(at + m) ^ key(cand + m)
        t0 = jnp.where((x & 0xFF) == 0, 1, 0)
        t1 = jnp.where((x & 0xFFFF) == 0, 1, 0)
        t2 = jnp.where((x & 0xFFFFFF) == 0, 1, 0)
        m = m + jnp.where(x == 0, 3, t0 + t1 + t2)
        m = jnp.minimum(m, n - at)
        op2 = emit_literal_checked(op, lit_start, at)
        op3 = emit_copy(op2, at - cand, m)
        end = at + m
        return end, end, op3

    def probe_group(ip, curs, hs):
        entries = [table_smem[h] for h in hs]
        for d in range(4):
            table_smem[hs[d]] = epoch | (ip + d)
        hits = []
        cands = []
        for d in range(4):
            cand_t = entries[d] & 0xFFFF
            okd = (
                ((entries[d] >> 16) == (epoch >> 16))
                & (cand_t < ip + d)
                & (key_v(cand_t) == curs[d])
            )
            cand = jnp.where(okd, cand_t, 0)
            for i in range(d):
                same = curs[i] == curs[d]
                cand = jnp.where(same, ip + i, cand)
                okd = okd | same
            hits.append(okd)
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
        return hit_any, d_first, cand_first

    def probe_group_trim(ip, curs, hs):
        """Hit DETECTION only (~10 fewer ops than probe_group): the
        epoch check folds into one unsigned compare (entry - epoch is
        the candidate position iff same epoch; any stale epoch or
        self/forward reference lands >= ip+d as unsigned). Candidate
        SELECTION re-derives from the returned entries inside the hit
        branch (resolve_hit) so the ~85% miss iterations skip its 10
        selects."""
        entries = [table_smem[h] for h in hs]
        for d in range(4):
            table_smem[hs[d]] = epoch | (ip + d)
        hits = []
        for d in range(4):
            cand_t = entries[d] - epoch
            okd = (
                cand_t.astype(jnp.uint32) < (ip + d).astype(jnp.uint32)
            ) & (key_v(cand_t & 0xFFFF) == curs[d])
            for i in range(d):
                okd = okd | (curs[i] == curs[d])
            hits.append(okd)
        hit_any = hits[0] | hits[1] | hits[2] | hits[3]
        return hit_any, entries, hits

    def resolve_hit(ip, curs, entries, hits):
        cands = []
        for d in range(4):
            cand = (entries[d] - epoch) & 0xFFFF
            for i in range(d):
                cand = jnp.where(curs[i] == curs[d], ip + i, cand)
            cands.append(cand)
        d_first = jnp.where(
            hits[0], 0, jnp.where(hits[1], 1, jnp.where(hits[2], 2, 3))
        )
        cand_first = jnp.where(
            hits[0],
            cands[0],
            jnp.where(hits[1], cands[1], jnp.where(hits[2], cands[2], cands[3])),
        )
        return d_first, cand_first

    def loads_at(ip):
        return (
            [key(ip + d) for d in range(4)],
            [hash_smem[ip + d] for d in range(4)],
        )

    def scan_cond(st):
        return st[0] + margin < n

    if variant == "enc2loop":
        # Two nested loops replace the per-iteration lax.cond: the
        # inner while scans misses (probe + advance, no cond at all);
        # the hit work (extension + emission) runs once per token,
        # value-gated so a bounds exit (no hit) is a no-op. Garbage
        # emission stores on the final no-hit exit land at/above the
        # frontier and are overwritten by the tail literal (the
        # kernel's standing garbage-tail contract).
        def inner_body(st):
            ip, skip, hit, df, cf = st
            curs, hs = loads_at(ip)
            hit_any, d_first, cand_first = probe_group(ip, curs, hs)
            ip2 = jnp.where(hit_any, ip, ip + 3 + (skip >> 5))
            return (ip2, skip + 1, hit_any, d_first, cand_first)

        def inner_cond(st):
            ip, skip, hit, df, cf = st
            return (~hit) & (ip + margin < n)

        def outer_body(st):
            ip, lit_start, op, skip = st
            ip, skip, hit, df, cf = jax.lax.while_loop(
                inner_cond, inner_body,
                (ip, skip, False, jnp.int32(0), jnp.int32(0)),
            )
            at = ip + df

            # extension (zero-trip when ~hit)
            def ext_body(st2):
                m, _ = st2
                p = jnp.minimum(at + m - 3, n - 5)
                table_smem[hash_smem[p]] = epoch | p
                return m + 4, key(at + m) == key(cand_f + m)

            def ext_cond(st2):
                m, go = st2
                return go & hit & (at + m + 4 <= n)

            cand_f = cf
            m, go = jax.lax.while_loop(
                ext_cond, ext_body, (jnp.int32(4), True)
            )
            m = jnp.where(go, m, m - 4)
            x = key(at + m) ^ key_v(cand_f + m)
            t0 = jnp.where((x & 0xFF) == 0, 1, 0)
            t1 = jnp.where((x & 0xFFFF) == 0, 1, 0)
            t2 = jnp.where((x & 0xFFFFFF) == 0, 1, 0)
            m = m + jnp.where(x == 0, 3, t0 + t1 + t2)
            m = jnp.minimum(m, n - at)

            lit_end = jnp.where(hit, at, lit_start)
            op2 = emit_literal_checked(op, lit_start, lit_end)
            op3 = emit_copy(op2, at - cand_f, jnp.where(hit, m, 4))
            op3 = jnp.where(hit, op3, op)
            end = at + m
            return (
                jnp.where(hit, end, ip),
                jnp.where(hit, end, lit_start),
                op3,
                jnp.where(hit, jnp.int32(skip_base), skip),
            )

        ip, lit_start, op, skip = jax.lax.while_loop(
            scan_cond, outer_body,
            (jnp.minimum(jnp.int32(1), n), jnp.int32(0), jnp.int32(0),
             jnp.int32(skip_base)),
        )
    elif variant == "encpre":
        def scan_body(st):
            ip, lit_start, op, skip, c0, c1, c2, c3, h0, h1, h2, h3 = st
            curs, hs = [c0, c1, c2, c3], [h0, h1, h2, h3]
            # speculative next-miss preload BEFORE resolution
            ipm = ip + 3 + (skip >> 5)
            nc, nh = loads_at(jnp.minimum(ipm, fc - 5))
            hit_any, d_first, cand_first = probe_group(ip, curs, hs)

            def hitp():
                at = ip + d_first
                end, ls, op3 = ext_and_emit(at, cand_first, lit_start, op)
                rc, rh = loads_at(jnp.minimum(end, fc - 5))
                return (end, ls, op3, jnp.int32(skip_base), *rc, *rh)

            def missp():
                return (ipm, lit_start, op, skip + 1, *nc, *nh)

            return jax.lax.cond(hit_any, hitp, missp)

        ip0 = jnp.minimum(jnp.int32(1), n)
        c0_, h0_ = loads_at(jnp.minimum(ip0, fc - 5))
        init = (ip0, jnp.int32(0), jnp.int32(0), jnp.int32(skip_base),
                *c0_, *h0_)
        st = jax.lax.while_loop(scan_cond, scan_body, init)
        ip, lit_start, op = st[0], st[1], st[2]
    elif variant in ("encwhen", "encwhen8"):
        # The ~50-cycle lax.cond (executed EVERY probe iteration,
        # ~205 us/block at 3,863 iterations) replaced by a ~3-cycle
        # pl.when region; the hit path's results (new frontier, new
        # emission offset) flow out through two SMEM scratch cells,
        # read back under a where — stale reads on the miss path are
        # masked by the select.
        def scan_body(st):
            ip, lit_start, op, skip = st
            curs, hs = loads_at(ip)
            hit_any, entries, hits = probe_group_trim(ip, curs, hs)

            @pl.when(hit_any)
            def _():
                d_first, cand_first = resolve_hit(ip, curs, entries, hits)
                at = ip + d_first
                end, ls, op3 = ext_and_emit(at, cand_first, lit_start, op)
                hold_smem[0] = end
                hold_smem[1] = op3

            end_h = hold_smem[0]
            ip2 = jnp.where(hit_any, end_h, ip + 3 + (skip >> 5))
            ls2 = jnp.where(hit_any, end_h, lit_start)
            op2 = jnp.where(hit_any, hold_smem[1], op)
            sk2 = jnp.where(hit_any, jnp.int32(skip_base), skip + 1)
            return ip2, ls2, op2, sk2
    elif trim:
        def scan_body(st):
            ip, lit_start, op, skip = st
            curs, hs = loads_at(ip)
            hit_any, entries, hits = probe_group_trim(ip, curs, hs)

            def hitp():
                d_first, cand_first = resolve_hit(ip, curs, entries, hits)
                at = ip + d_first
                end, ls, op3 = ext_and_emit(at, cand_first, lit_start, op)
                return (end, ls, op3, jnp.int32(skip_base))

            return jax.lax.cond(
                hit_any,
                hitp,
                lambda: (ip + 3 + (skip >> 5), lit_start, op, skip + 1),
            )
    else:
        def scan_body(st):
            ip, lit_start, op, skip = st
            curs, hs = loads_at(ip)
            hit_any, d_first, cand_first = probe_group(ip, curs, hs)

            def hitp():
                at = ip + d_first
                end, ls, op3 = ext_and_emit(at, cand_first, lit_start, op)
                return (end, ls, op3, jnp.int32(skip_base))

            return jax.lax.cond(
                hit_any,
                hitp,
                lambda: (ip + 3 + (skip >> 5), lit_start, op, skip + 1),
            )

    if variant in ("encoct", "encoct8"):
        # Two quad-groups per backedge (8 positions probed, advance
        # 6 + 2*(skip>>5) on full miss): halves the MISS backedges —
        # the last iteration-count lever after ext8u. All 8 entry
        # loads happen before the 8 stores, so group 2 cannot see
        # group 1's stores; nearest-previous candidates across the
        # whole window come from the full intra-window same chain.
        def scan_body8(st):
            ip, lit_start, op, skip = st
            curs = [key(ip + d) for d in range(8)]
            hs = [hash_smem[ip + d] for d in range(8)]
            entries = [table_smem[h] for h in hs]
            for d in range(8):
                table_smem[hs[d]] = epoch | (ip + d)
            hits = []
            cands = []
            for d in range(8):
                cand_t = entries[d] & 0xFFFF
                okd = (
                    ((entries[d] >> 16) == (epoch >> 16))
                    & (cand_t < ip + d)
                    & (key_v(cand_t) == curs[d])
                )
                cand = jnp.where(okd, cand_t, 0)
                for i in range(d):
                    same = curs[i] == curs[d]
                    cand = jnp.where(same, ip + i, cand)
                    okd = okd | same
                hits.append(okd)
                cands.append(cand)
            hit_any = hits[0]
            for d in range(1, 8):
                hit_any = hit_any | hits[d]
            d_first = jnp.int32(7)
            cand_first = cands[7]
            for d in range(6, -1, -1):
                d_first = jnp.where(hits[d], d, d_first)
                cand_first = jnp.where(hits[d], cands[d], cand_first)

            def hitp():
                at = ip + d_first
                end, ls, op3 = ext_and_emit(at, cand_first, lit_start, op)
                return (end, ls, op3, jnp.int32(skip_base))

            return jax.lax.cond(
                hit_any,
                hitp,
                lambda: (
                    ip + 6 + 2 * (skip >> 5), lit_start, op, skip + 2
                ),
            )

        def scan_cond8(st):
            return st[0] + margin + 4 < n

        ip, lit_start, op, skip = jax.lax.while_loop(
            scan_cond8, scan_body8,
            (jnp.minimum(jnp.int32(1), n), jnp.int32(0), jnp.int32(0),
             jnp.int32(skip_base)),
        )
    elif variant not in ("enc2loop", "encpre"):
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


@functools.partial(jax.jit, static_argnames=("variant",))
def encode_r4(frags, lengths, variant: str = "encpre"):
    frags = frags.astype(jnp.int32)
    B, F = frags.shape
    oc = F + 2048
    ocw = -(-(oc // 4) // 1024) * 1024
    keys = _keys_from_frags(frags)
    hashes = jax.lax.shift_right_logical(
        keys * _HASH_MUL, 32 - _HASH_BITS
    ) & ((1 << _HASH_BITS) - 1)
    ow, body_lens = pl.pallas_call(
        functools.partial(_encode_kernel_r4, variant=variant),
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
            pltpu.SMEM((F + 1024,), jnp.int32),
            pltpu.SMEM((F + 1024,), jnp.int32),
            pltpu.SMEM((ocw,), jnp.int32),
            pltpu.SMEM((1 << _HASH_BITS,), jnp.int32),
            pltpu.SMEM((8,), jnp.int32),  # hold cells (encwhen*)
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=False,
    )(keys.reshape(-1), hashes.reshape(-1), lengths.astype(jnp.int32))
    sh = jnp.arange(4, dtype=jnp.int32) * 8
    by = (
        jax.lax.shift_right_logical(
            ow.reshape(B, ocw)[:, :, None], sh[None, None, :]
        ) & 0xFF
    ).reshape(B, ocw * 4)
    return by[:, :oc], body_lens


# --------------------------------------------------------------------------
# encstats: instrumented walk — counts miss iterations, hits, extension
# iterations, and total match bytes, to pin the encoder time budget.
# --------------------------------------------------------------------------


def _encode_stats_kernel(keys_ref, hashes_ref, lens_ref, stats_ref,
                         key_smem, hash_smem, table_smem, sem_in, sem_hash,
                         *, hash_bits=_HASH_BITS, skip_base=32):
    b = pl.program_id(0)
    fc = key_smem.shape[0]
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
        return key_smem[i]

    def key_v(i):
        return key_smem[jnp.minimum(i, fc - 1)]

    epoch = ((b & 0x7FFF) + 1) << 16
    margin = 15

    def scan_cond(st):
        return st[0] + margin < n

    def scan_body(st):
        ip, skip, miss_it, hits, ext_it, mbytes, lit_bytes = st
        curs = [key(ip + d) for d in range(4)]
        hs = [hash_smem[ip + d] for d in range(4)]
        entries = [table_smem[h] for h in hs]
        for d in range(4):
            table_smem[hs[d]] = epoch | (ip + d)
        hlist = []
        cands = []
        for d in range(4):
            cand_t = entries[d] & 0xFFFF
            okd = (
                ((entries[d] >> 16) == (epoch >> 16))
                & (cand_t < ip + d)
                & (key_v(cand_t) == curs[d])
            )
            cand = jnp.where(okd, cand_t, 0)
            for i in range(d):
                same = curs[i] == curs[d]
                cand = jnp.where(same, ip + i, cand)
                okd = okd | same
            hlist.append(okd)
            cands.append(cand)
        hit_any = hlist[0] | hlist[1] | hlist[2] | hlist[3]
        d_first = jnp.where(
            hlist[0], 0, jnp.where(hlist[1], 1, jnp.where(hlist[2], 2, 3))
        )
        cand_first = jnp.where(
            hlist[0],
            cands[0],
            jnp.where(hlist[1], cands[1], jnp.where(hlist[2], cands[2], cands[3])),
        )

        def hitp():
            at = ip + d_first
            cand = cand_first

            def ext_body(st2):
                m, _, k = st2
                p = jnp.minimum(at + m - 3, n - 5)
                table_smem[hash_smem[p]] = epoch | p
                return m + 4, key(at + m) == key(cand + m), k + 1

            def ext_cond(st2):
                m, go, k = st2
                return go & (at + m + 4 <= n)

            m, go, k = jax.lax.while_loop(
                ext_cond, ext_body, (jnp.int32(4), True, jnp.int32(0))
            )
            m = jnp.where(go, m, m - 4)
            x = key(at + m) ^ key(cand + m)
            t0 = jnp.where((x & 0xFF) == 0, 1, 0)
            t1 = jnp.where((x & 0xFFFF) == 0, 1, 0)
            t2 = jnp.where((x & 0xFFFFFF) == 0, 1, 0)
            m = m + jnp.where(x == 0, 3, t0 + t1 + t2)
            m = jnp.minimum(m, n - at)
            return (at + m, jnp.int32(skip_base), miss_it, hits + 1,
                    ext_it + k, mbytes + m, lit_bytes + (at - 0))

        def missp():
            return (ip + 3 + (skip >> 5), skip + 1, miss_it + 1, hits,
                    ext_it, mbytes, lit_bytes)

        return jax.lax.cond(hit_any, hitp, missp)

    ip, skip, miss_it, hits, ext_it, mbytes, lit_bytes = jax.lax.while_loop(
        scan_cond, scan_body,
        (jnp.minimum(jnp.int32(1), n), jnp.int32(skip_base), jnp.int32(0),
         jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0)),
    )
    stats_ref[b, 0] = miss_it
    stats_ref[b, 1] = hits
    stats_ref[b, 2] = ext_it
    stats_ref[b, 3] = mbytes


@jax.jit
def encode_stats(frags, lengths):
    frags = frags.astype(jnp.int32)
    B, F = frags.shape
    keys = _keys_from_frags(frags)
    hashes = jax.lax.shift_right_logical(
        keys * _HASH_MUL, 32 - _HASH_BITS
    ) & ((1 << _HASH_BITS) - 1)
    return pl.pallas_call(
        _encode_stats_kernel,
        grid=(B,),
        out_shape=jax.ShapeDtypeStruct((B, 4), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.SMEM((F + 1024,), jnp.int32),
            pltpu.SMEM((F + 1024,), jnp.int32),
            pltpu.SMEM((1 << _HASH_BITS,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=False,
    )(keys.reshape(-1), hashes.reshape(-1), lengths.astype(jnp.int32))


# --------------------------------------------------------------------------
# Harness
# --------------------------------------------------------------------------


def _html_blocks(B: int):
    html = pathlib.Path(
        "/root/reference/Snappier.Tests/TestData/html"
    ).read_bytes()
    reps = -(-B * BLOCK_SIZE // len(html))
    tiled = (html * reps)[: B * BLOCK_SIZE]
    frags = np.frombuffer(tiled, np.uint8).reshape(B, BLOCK_SIZE).astype(
        np.int32
    )
    lengths = np.full(B, BLOCK_SIZE, np.int32)
    return frags, lengths


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    variants = sys.argv[2:] or ["base", "pipe"]
    frags, lengths = _html_blocks(B)
    fd, ld = jnp.asarray(frags), jnp.asarray(lengths)

    bodies, blens = encode_blocks_scalar(fd, ld)
    bodies_h = np.asarray(bodies, np.uint8)
    blens_h = np.asarray(blens)
    pre = np.stack(
        [
            (lengths & 0x7F) | 0x80,
            ((lengths >> 7) & 0x7F) | 0x80,
            (lengths >> 14) & 0x7F,
        ],
        axis=1,
    ).astype(np.uint8)
    blocks = np.concatenate([pre, bodies_h], axis=1)
    pad = (-blocks.shape[1]) % 1024
    blocks = np.concatenate([blocks, np.zeros((B, pad), blocks.dtype)], axis=1)
    bd = jax.device_put(jnp.asarray(blocks.astype(np.int32)))
    bl = jax.device_put(jnp.asarray(blens_h + 3))

    # tags/block on html (ip walk over one block)
    from tools.perf_r3 import count_tags  # noqa: E402

    blk0 = bytes([1]) if False else None
    import snappier_tpu.format.varint as vi

    one = vi.write_varint(BLOCK_SIZE) + bodies_h[0, : blens_h[0]].tobytes()
    tags = count_tags(one)
    print(f"B={B}, tags/block={tags}")

    if "encstats" in variants:
        st = np.asarray(encode_stats(fd, ld))
        tot = st.sum(axis=0) / B
        print(
            f"encstats (per block avg): miss_iters={tot[0]:.0f} "
            f"hits={tot[1]:.0f} ext_iters={tot[2]:.0f} "
            f"match_bytes={tot[3]:.0f} "
            f"(ext iters/hit={tot[2]/max(tot[1],1):.2f}, "
            f"match len avg={tot[3]/max(tot[1],1):.1f})"
        )
        variants = [x for x in variants if x != "encstats"]

    enc_ref_lens = blens_h
    for v in [x for x in variants if x.startswith("enc")]:
        if v == "encbase":
            efn = lambda: encode_blocks_scalar(fd, ld)
        else:
            efn = lambda v=v: encode_r4(fd, ld, variant=v)
        eb, el = efn()
        el_h = np.asarray(el)
        ratio_note = ""
        if v == "encdmaonly":
            t = timeit(efn)
            print(
                f"{v}: {t*1e3:.2f} ms/batch, {t/B*1e6:.1f} us/block "
                "(DMA + dispatch share, no walk)"
            )
            continue
        if v in ("encext8", "encfull", "encext8u", "encext16u", "encwhen8",
                 "encr4", "encext8s2", "encoct", "encoct8"):
            # Stride-8 extension seeds the table differently, so the
            # output is a different VALID encoding: verify by decoding
            # and report the density delta instead of byte identity.
            eb_h = np.asarray(eb, np.uint8)
            rows = []
            for i in range(B):
                body = eb_h[i, : el_h[i]].tobytes()
                rows.append(b"\x80\x80\x04" + body)  # varint(65536)
            cc = -(-max(len(r) for r in rows) // 1024) * 1024
            darr = np.zeros((B, cc), np.int32)
            for i, r in enumerate(rows):
                darr[i, : len(r)] = np.frombuffer(r, np.uint8)
            dlens = np.array([len(r) for r in rows], np.int32)
            dout, dol, derr = decode_blocks_scalar(
                jnp.asarray(darr), jnp.asarray(dlens), out_cap=BLOCK_SIZE
            )
            assert int(np.max(np.asarray(derr))) == 0, f"{v} decode err"
            assert (
                np.asarray(dout, np.uint8) == np.asarray(fd, np.uint8)
            ).all(), f"{v} roundtrip mismatch"
            ratio_note = (
                f", size {el_h.sum()/enc_ref_lens.sum()*100:.2f}% of base"
            )
        else:
            assert (el_h == enc_ref_lens).all(), f"{v} body_lens mismatch"
            if v != "encnoemit":
                assert (
                    np.asarray(eb, np.uint8)[:, : bodies_h.shape[1]][
                        0, : el_h[0]
                    ]
                    == bodies_h[0, : el_h[0]]
                ).all(), f"{v} bytes mismatch"
        t = timeit(efn)
        print(
            f"{v}: {t*1e3:.2f} ms/batch, {t/B*1e6:.1f} us/block, "
            f"{B*BLOCK_SIZE/t/1e6:.1f} MB/s{ratio_note}"
        )
    variants = [x for x in variants if not x.startswith("enc")]

    ref_out = None
    for v in variants:
        if v == "base":
            fn = lambda: decode_blocks_scalar(bd, bl, out_cap=BLOCK_SIZE)
        elif v == "pipe":
            fn = lambda: decode_pipe(bd, bl, out_cap=BLOCK_SIZE)
        elif v == "pipe2u1":
            fn = lambda: decode_pipe2(bd, bl, out_cap=BLOCK_SIZE, unroll=1)
        elif v == "pipe2u2":
            fn = lambda: decode_pipe2(bd, bl, out_cap=BLOCK_SIZE, unroll=2)
        elif v == "pipe2u3":
            fn = lambda: decode_pipe2(bd, bl, out_cap=BLOCK_SIZE, unroll=3)
        elif v == "pipe2u4":
            fn = lambda: decode_pipe2(bd, bl, out_cap=BLOCK_SIZE, unroll=4)
        elif v == "pipe2unc":
            # Unconditional first store pair in both append paths:
            # one pl.when branch fewer per tag.
            fn = lambda: decode_pipe2(
                bd, bl, out_cap=BLOCK_SIZE, unroll=2, unc=1
            )
        elif v == "pipe2unc2":
            # ... and the stream path's second pair unconditional too.
            fn = lambda: decode_pipe2(
                bd, bl, out_cap=BLOCK_SIZE, unroll=2, unc=2
            )
        elif v == "pipe2dma":
            # Deferred output-DMA wait: program b-1's out-copy drains
            # under program b's input DMA + walk.
            fn = lambda: decode_pipe2(
                bd, bl, out_cap=BLOCK_SIZE, unroll=2, unc=1, dma_pipe=True
            )
        elif v == "denoemit":
            # Walk with payload stores removed: the decode-side
            # walk/emission split for the round-4 budget table. Output
            # is garbage; only errs/timing are meaningful.
            fn = lambda: decode_pipe2(
                bd, bl, out_cap=BLOCK_SIZE, unroll=2, emit=False
            )
        else:
            print(f"unknown variant {v}")
            continue
        out, olens, errs = fn()
        out_h = np.asarray(out, np.uint8)
        assert int(np.max(np.asarray(errs))) == 0, v
        if v == "denoemit":
            pass  # no payload stores: output is garbage by design
        elif ref_out is None:
            ref_out = out_h
        else:
            assert (out_h == ref_out).all(), f"{v} output mismatch"
        t = timeit(fn)
        per_block = t / B
        print(
            f"{v}: {t*1e3:.2f} ms/batch, {per_block*1e6:.1f} us/block, "
            f"{per_block/tags*1e9:.1f} ns/tag, "
            f"{B*BLOCK_SIZE/t/1e6:.1f} MB/s"
        )


if __name__ == "__main__":
    main()
