"""Encode-kernel ablation probe (run on the real TPU chip).

Round-2 experiment harness: variants of the scalar-core encode walk,
timed on B x 64 KiB html blocks with the bench.py methodology (host
fetch as completion barrier, best-of-N). Winners get ported into
ops/pallas/scalar_codec.py; results are recorded in docs/ROADMAP.md.

The baseline kernel (ops/pallas/scalar_codec.py:_encode_kernel) nests
five lax control-flow constructs per hit (extension while, tail while,
literal cond+fori, copy while+cond, seed fori) at ~45-55 cycles of
loop machinery each. The variants here flatten them:

  e0       library kernel (baseline)
  e1       merged seed-into-extension loop (one loop walks the match,
           seeding the hash table as it extends)
  e2       e1 + branchless <=3-byte tail from the key XOR (kills the
           tail while-loop)
  e3       e2 + branchless copy1/copy2 emit with sloppy 3-byte store
           (kills the emit cond; overstore is overwritten by the next
           tag)
  e4       e3 + probe-floor: no emission at all (walk + extension
           only — the scalar lower bound for this probe structure)
  e5       e3 + skip-probe prefilter: cheap 1-load early-out
Usage: python tools/perf_probe_enc.py [variant ...]
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

from snappier_tpu.constants import BLOCK_SIZE, MAX_SHORT_LITERAL

jax.config.update(
    "jax_compilation_cache_dir",
    str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache_tpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

_UNROLL = 8
_HASH_BITS = 14
_HASH_MUL = 0x1E35A7BD


def _encode_kernel_v(keys_ref, lens_ref, out_ref, outlen_ref,
                     key_smem, out_smem, table_smem, sem_in, sem_out,
                     *, merged_seed, branchless_tail, branchless_copy,
                     no_emit, ext8=False, adv4=False, probe8=False,
                     hb=_HASH_BITS, nstores=4, no_scan=False):
    b = pl.program_id(0)
    fc = key_smem.shape[0]
    oc = out_smem.shape[0]
    n = lens_ref[b]

    cp_in = pltpu.make_async_copy(
        keys_ref.at[pl.ds(b * fc, fc)], key_smem, sem_in
    )
    cp_in.start()
    cp_in.wait()

    def key(i):
        return key_smem[jnp.clip(i, 0, fc - 1)]

    def byte(i):
        return key(i) & 0xFF

    epoch = ((b & 0x7FFF) + 1) << 16

    def emit_literal(op, lit_start, lit_end):
        llen = lit_end - lit_start

        def short_case():
            out_smem[jnp.clip(op, 0, oc - 1)] = (llen - 1) << 2
            return op + 1

        def long_case():
            extra = jnp.where(llen <= 256, 1, 2)
            out_smem[jnp.clip(op, 0, oc - 1)] = (59 + extra) << 2
            out_smem[jnp.clip(op + 1, 0, oc - 1)] = (llen - 1) & 0xFF

            @pl.when(extra == 2)
            def _():
                out_smem[jnp.clip(op + 2, 0, oc - 1)] = ((llen - 1) >> 8) & 0xFF

            return op + 1 + extra

        op = jax.lax.cond(llen <= MAX_SHORT_LITERAL, short_case, long_case)
        chunks = (llen + _UNROLL - 1) // _UNROLL

        def cp(k, _):
            base = op + k * _UNROLL
            sb = lit_start + k * _UNROLL
            for u in range(_UNROLL):
                out_smem[base + u] = key_smem[sb + u] & 0xFF
            return 0

        jax.lax.fori_loop(0, chunks, cp, 0, unroll=False)
        return op + llen

    def emit_literal_checked(op, lit_start, lit_end):
        return jax.lax.cond(
            lit_end > lit_start,
            lambda: emit_literal(op, lit_start, lit_end),
            lambda: op,
        )

    def emit_copy_upto64_cond(op, off, length):
        def copy1():
            out_smem[jnp.clip(op, 0, oc - 1)] = (
                1 | ((length - 4) << 2) | ((off >> 8) << 5)
            )
            out_smem[jnp.clip(op + 1, 0, oc - 1)] = off & 0xFF
            return op + 2

        def copy2():
            out_smem[jnp.clip(op, 0, oc - 1)] = 2 | ((length - 1) << 2)
            out_smem[jnp.clip(op + 1, 0, oc - 1)] = off & 0xFF
            out_smem[jnp.clip(op + 2, 0, oc - 1)] = (off >> 8) & 0xFF
            return op + 3

        return jax.lax.cond((length <= 11) & (off < 2048), copy1, copy2)

    def emit_copy_upto64_bfree(op, off, length):
        # Branchless: compute both tag forms, select, and always store
        # 3 bytes (the copy1 overstore at op+2 is overwritten by the
        # next tag — output image has >= 1 KiB slack).
        is1 = (length <= 11) & (off < 2048)
        b0 = jnp.where(
            is1,
            1 | ((length - 4) << 2) | ((off >> 8) << 5),
            2 | ((length - 1) << 2),
        )
        p = jnp.clip(op, 0, oc - 3)
        out_smem[p] = b0
        out_smem[p + 1] = off & 0xFF
        out_smem[p + 2] = (off >> 8) & 0xFF
        return op + jnp.where(is1, 2, 3)

    emit_copy_upto64 = (
        emit_copy_upto64_bfree if branchless_copy else emit_copy_upto64_cond
    )

    def emit_copy(op, off, length):
        def big_cond(st):
            op, length = st
            return length >= 68

        def big_body(st):
            op, length = st
            return emit_copy_upto64(op, off, 64), length - 64

        op, length = jax.lax.while_loop(big_cond, big_body, (op, length))

        def split_case(op, length):
            op = emit_copy_upto64(op, off, 60)
            return emit_copy_upto64(op, off, length - 60)

        return jax.lax.cond(
            length > 64,
            lambda: split_case(op, length),
            lambda: emit_copy_upto64(op, off, length),
        )

    margin = 15

    def scan_cond(st):
        ip, lit_start, op, skip = st
        return ip + margin < n

    def on_hit(at, cand, lit_start, op):
        if ext8:
            # Stride-8 extension: two 4-byte-group compares per
            # iteration halves the loop count; one table seed per 8
            # covered bytes (ratio impact measured via the probe).
            def ext_body(st):
                m, _, _ = st
                p = jnp.minimum(at + m - 3, n - 5)
                kv = key(p)
                hh = ((kv * _HASH_MUL) >> (32 - hb)) & ((1 << hb) - 1)
                table_smem[hh] = epoch | p
                g1 = key(at + m) == key(cand + m)
                g2 = key(at + m + 4) == key(cand + m + 4)
                return m + 8, g1 & g2, g1

            def ext_cond(st):
                m, go, _ = st
                return go & (at + m + 8 <= n)

            m, go, g1 = jax.lax.while_loop(
                ext_cond, ext_body, (jnp.int32(4), True, True)
            )
            # Mismatch exit: rewind to the first failing 4-byte group.
            m = jnp.where(go, m, jnp.where(g1, m - 4, m - 8))
            # Bounds exit leaves up to 7 more matchable bytes: one
            # conditional stride-4 step, then the XOR tail below.
            m = m + jnp.where(
                go & (at + m + 4 <= n) & (key(at + m) == key(cand + m)),
                4,
                0,
            )
        elif merged_seed:
            # One loop walks the match at stride 4, extending the
            # length AND seeding the table from the covered span
            # (baseline positions at+1+4k). Sloppy seeds (the final
            # mismatching iteration seeds one position near the match
            # end) are safe: every probe verifies key(cand) == cur
            # before use.
            def ext_body(st):
                m, _ = st
                p = jnp.minimum(at + m - 3, n - 5)
                kv = key(p)
                hh = ((kv * _HASH_MUL) >> (32 - hb)) & ((1 << hb) - 1)
                table_smem[hh] = epoch | p
                return m + 4, key(at + m) == key(cand + m)

            def ext_cond(st):
                m, go = st
                return go & (at + m + 4 <= n)

            m, go = jax.lax.while_loop(
                ext_cond, ext_body, (jnp.int32(4), True)
            )
            # Exit on mismatch overshoots by the failing group; exit on
            # the bounds guard does not.
            m = jnp.where(go, m, m - 4)
        else:
            def ext_cond(m):
                return (at + m + 4 <= n) & (key(at + m) == key(cand + m))

            m = jax.lax.while_loop(ext_cond, lambda m: m + 4, jnp.int32(4))

        if branchless_tail:
            x = key(at + m) ^ key(cand + m)
            t0 = jnp.where((x & 0xFF) == 0, 1, 0)
            t1 = jnp.where((x & 0xFFFF) == 0, 1, 0)
            t2 = jnp.where((x & 0xFFFFFF) == 0, 1, 0)
            m = m + jnp.where(x == 0, 3, t0 + t1 + t2)
            m = jnp.minimum(m, n - at)
        else:
            def tail_cond(st):
                m, t = st
                return (t < 3) & (at + m < n) & (byte(at + m) == byte(cand + m))

            m, _ = jax.lax.while_loop(
                tail_cond, lambda st: (st[0] + 1, st[1] + 1),
                (m, jnp.int32(0)),
            )
            m = jnp.minimum(m, n - at)

        end = at + m
        if no_emit:
            op3 = op + 2  # pretend-emit so outlen is nonzero
            new_lit = end
        else:
            op2 = emit_literal_checked(op, lit_start, at)
            op3 = emit_copy(op2, at - cand, m)
            new_lit = end

        if not merged_seed:
            def seed(k, _):
                p = at + 1 + 4 * k
                kv = key(p)
                hh = ((kv * _HASH_MUL) >> (32 - hb)) & ((1 << hb) - 1)
                table_smem[hh] = epoch | p
                return 0

            nseed = jnp.maximum((jnp.minimum(end, n - 4) - at) // 4, 0)
            jax.lax.fori_loop(0, nseed, seed, 0, unroll=False)
        return end, new_lit, op3, jnp.int32(32)

    W = 8 if probe8 else 4
    miss_adv = W if adv4 else W - 1

    def scan_body(st):
        ip, lit_start, op, skip = st
        curs = [key(ip + d) for d in range(W)]
        mixes = [c * _HASH_MUL for c in curs]
        hs = [(mm >> (32 - hb)) & ((1 << hb) - 1) for mm in mixes]
        entries = [table_smem[h] for h in hs]
        for d in range(0, W, W // nstores if nstores < W else 1):
            table_smem[hs[d]] = epoch | (ip + d)
        hits = []
        cands = []
        for d in range(W):
            cand_t = entries[d] & 0xFFFF
            ok = (
                ((entries[d] >> 16) == (epoch >> 16))
                & (cand_t < ip + d)
                & (key(cand_t) == curs[d])
            )
            cand = jnp.where(ok, cand_t, 0)
            for i in range(d):
                same = curs[i] == curs[d]
                cand = jnp.where(same, ip + i, cand)
                ok = ok | same
            hits.append(ok)
            cands.append(cand)

        hit_any = hits[0]
        for d in range(1, W):
            hit_any = hit_any | hits[d]
        d_first = jnp.int32(W - 1)
        cand_first = cands[W - 1]
        for d in range(W - 2, -1, -1):
            d_first = jnp.where(hits[d], d, d_first)
            cand_first = jnp.where(hits[d], cands[d], cand_first)

        return jax.lax.cond(
            hit_any,
            lambda: on_hit(ip + d_first, cand_first, lit_start, op),
            lambda: (ip + miss_adv + (skip >> 5), lit_start, op, skip + 1),
        )

    if no_scan:
        op = jnp.int32(0)
    else:
        ip, lit_start, op, skip = jax.lax.while_loop(
            scan_cond, scan_body,
            (jnp.minimum(jnp.int32(1), n), jnp.int32(0), jnp.int32(0),
             jnp.int32(32)),
        )
        if not no_emit:
            op = emit_literal_checked(op, lit_start, n)
    outlen_ref[b] = op

    cp_out = pltpu.make_async_copy(
        out_smem, out_ref.at[pl.ds(b * oc, oc)], sem_out
    )
    cp_out.start()
    cp_out.wait()


def _keys_from_frags(frags):
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


@functools.partial(jax.jit, static_argnames=("flags",))
def encode_variant(frags, lengths, flags: tuple):
    frags = frags.astype(jnp.int32)
    B, F = frags.shape
    oc = F + 2048
    keys = _keys_from_frags(frags)
    hb = _HASH_BITS
    nstores = 4
    for f in flags:
        if f.startswith("hb"):
            hb = int(f[2:])
        if f.startswith("st"):
            nstores = int(f[2:])
    kern = functools.partial(
        _encode_kernel_v,
        merged_seed="merged" in flags,
        branchless_tail="btail" in flags,
        branchless_copy="bcopy" in flags,
        no_emit="noemit" in flags,
        ext8="ext8" in flags,
        adv4="adv4" in flags,
        probe8="probe8" in flags,
        hb=hb,
        nstores=nstores,
        no_scan="noscan" in flags,
    )
    bodies, body_lens = pl.pallas_call(
        kern,
        grid=(B,),
        out_shape=(
            jax.ShapeDtypeStruct((B * oc,), jnp.int32),
            jax.ShapeDtypeStruct((B,), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.SMEM((F + 1024,), jnp.int32),
            pltpu.SMEM((oc,), jnp.int32),
            pltpu.SMEM((1 << _HASH_BITS,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=False,
    )(keys.reshape(-1), lengths.astype(jnp.int32))
    return bodies.reshape(B, oc), body_lens


VARIANT_FLAGS = {
    "e1": ("merged",),
    "e2": ("merged", "btail"),
    "e3": ("merged", "btail", "bcopy"),
    "e4": ("merged", "btail", "bcopy", "noemit"),
    "eb": ("btail",),
    "ec": ("bcopy",),
    "ebc": ("btail", "bcopy"),
    "e6": ("ext8", "btail", "bcopy"),
    "e6a": ("ext8", "btail", "bcopy", "adv4"),
    "e7": ("ext8", "btail", "bcopy", "adv4", "probe8"),
    "e7n": ("ext8", "btail", "bcopy", "adv4", "probe8", "noemit"),
    "e6n": ("ext8", "btail", "bcopy", "adv4", "noemit"),
    "e9": ("merged", "btail", "bcopy", "st2"),
    "e10": ("merged", "btail", "bcopy", "hb13"),
    "e11": ("merged", "btail", "bcopy", "hb12", "st2"),
    "edma": ("noscan", "noemit"),
}


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


def build_blocks(B):
    html = pathlib.Path("/root/reference/Snappier.Tests/TestData/html").read_bytes()
    reps = -(-B * BLOCK_SIZE // len(html))
    tiled = (html * reps)[: B * BLOCK_SIZE]
    frags = np.frombuffer(tiled, np.uint8).reshape(B, BLOCK_SIZE).astype(np.int32)
    lengths = np.full(B, BLOCK_SIZE, np.int32)
    return frags, lengths


def main():
    variants = sys.argv[1:] or ["e0", "e1", "e2", "e3", "e4"]
    B = 128
    frags, lengths = build_blocks(B)
    frags_d = jax.device_put(jnp.asarray(frags))
    lens_d = jax.device_put(jnp.asarray(lengths))
    gb = B * BLOCK_SIZE / 1e9

    from snappier_tpu.format import oracle

    for v in variants:
        if v == "e0":
            from snappier_tpu.ops.pallas.scalar_codec import (
                encode_blocks_scalar,
            )

            fn = lambda: encode_blocks_scalar(frags_d, lens_d, interpret=False)
        else:
            fn = functools.partial(
                encode_variant, frags_d, lens_d, VARIANT_FLAGS[v]
            )
        bodies, body_lens = fn()
        bl = np.asarray(body_lens)
        ratio = bl.sum() / (B * BLOCK_SIZE)
        ok = True
        if v != "e4" and "noemit" not in VARIANT_FLAGS.get(v, ()):
            for bi in (0, B - 1):
                pre = bytes([0x80, 0x80, 0x04])  # varint 65536
                body = bytes(
                    np.asarray(bodies[bi])[: bl[bi]].astype(np.uint8)
                )
                out = oracle.decompress(pre + body)
                ok &= out == bytes(frags[bi].astype(np.uint8))
        t = timeit(fn)
        per_block = t / B
        print(
            f"{v}: {'OK ' if ok else 'BAD'} {t*1e3:.2f} ms total, "
            f"{per_block*1e6:.0f} us/block, {gb/t:.3f} GB/s, "
            f"ratio {ratio:.4f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
