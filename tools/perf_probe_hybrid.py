"""Micro-probes for the hybrid (scalar-parse + VPU-materialize) decode
design (run on the real TPU chip).

The design under test: a vector pre-pass computes per-byte speculative
tag descriptors (advance/len/off — pure arithmetic, no LUT); a minimal
scalar chain walk resolves real tag boundaries (ip += adv[ip]) and
emits per-tag records; the VPU materializes payloads with dynamic-row
VMEM loads + lane rotates. These probes measure the primitive costs:

  chain     pure boundary walk: ip += adv_smem[ip] (ns/tag floor)
  chainrec  walk + output-offset accumulation + packed record stores
  vcopy     per-record vector copy body: dynamic (1,128) row load from
            a (128,128) VMEM image, lane rotate, funnel, masked merge,
            dynamic row store
  vcopy3d   same via (16,8,128) tile-aligned dynamic indexing
  coissue   scalar dependency chain alone vs + independent vector ops
            (does Mosaic dual-issue scalar and vector slots?)

Usage: python tools/perf_probe_hybrid.py [probe ...]
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

T = 6144  # records / tags per trial
R = 200  # kernel-internal repeats to swamp launch overhead


def _tags_from_html():
    """Per-byte advance array + record stream from a real html block."""
    from snappier_tpu.format import oracle
    from snappier_tpu.format.varint import read_varint

    html = pathlib.Path(
        "/root/reference/Snappier.Tests/TestData/html"
    ).read_bytes()
    block = bytes(oracle.compress(html[:65536]))
    body = np.frombuffer(block, np.uint8)
    _, pos = read_varint(body)
    adv = np.ones(len(body) + 8, np.int32)
    recs = []
    op = 0
    while pos < len(body):
        t = int(body[pos])
        tt = t & 3
        if tt == 0:
            l6 = t >> 2
            if l6 < 60:
                ln = l6 + 1
                a = 1 + ln
            else:
                e = l6 - 59
                ln = int.from_bytes(body[pos + 1 : pos + 1 + e], "little") + 1
                a = 1 + e + ln
            recs.append((op, pos + a - ln, ln, 1))
        else:
            if tt == 1:
                ln = ((t >> 2) & 7) + 4
                off = ((t >> 5) << 8) | int(body[pos + 1])
                a = 2
            elif tt == 2:
                ln = (t >> 2) + 1
                off = int.from_bytes(body[pos + 1 : pos + 3], "little")
                a = 3
            else:
                ln = (t >> 2) + 1
                off = int.from_bytes(body[pos + 1 : pos + 5], "little")
                a = 5
            recs.append((op, op - off, ln, 0))
        adv[pos] = a
        pos += a
        op += ln
    return adv, np.array(recs, np.int32), pos, op


def timeit(fn, iters=3, passes=3):
    # Fetch the SMALLEST leaf as the completion barrier: fetching a big
    # leaf measures the ~130 MB/s HTTP tunnel, not the kernel.
    def barrier(r):
        leaves = jax.tree.leaves(r)
        np.asarray(min(leaves, key=lambda x: x.size))

    barrier(fn())
    best = float("inf")
    for _ in range(passes):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn()
        barrier(r)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


# --- chain / chainrec ------------------------------------------------------


def _chain_kernel(adv_ref, meta_ref, out_ref, adv_smem, rec_smem, sem,
                  *, with_rec):
    cp = pltpu.make_async_copy(adv_ref, adv_smem, sem)
    cp.start()
    cp.wait()
    n = meta_ref[0]
    start = meta_ref[1]
    acc = jnp.int32(0)

    def trial(r, acc):
        def cond(st):
            ip, op, t = st
            return ip < n

        if with_rec:
            def body(st):
                ip, op, t = st
                a = adv_smem[ip]
                rec_smem[t] = (ip << 8) | (a & 0xFF)
                rec_smem[t + 8192] = op
                return ip + a, op + a, t + 1
        else:
            def body(st):
                ip, op, t = st
                return ip + adv_smem[ip], op, t

        ip, op, t = jax.lax.while_loop(
            cond, body, (start + (r & 1), jnp.int32(0), jnp.int32(0))
        )
        return acc + ip + t

    acc = jax.lax.fori_loop(0, R, trial, acc, unroll=False)
    out_ref[0] = acc


def chain(with_rec=False):
    adv, recs, n, _ = _tags_from_html()
    pad = -(-len(adv) // 1024) * 1024
    advp = np.zeros(pad, np.int32)
    advp[: len(adv)] = adv
    meta = jnp.asarray(np.array([n, 3], np.int32))

    @jax.jit
    def run():
        return pl.pallas_call(
            functools.partial(_chain_kernel, with_rec=with_rec),
            out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[
                pltpu.SMEM((pad,), jnp.int32),
                pltpu.SMEM((16384,), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(jnp.asarray(advp), meta)

    t = timeit(run)
    ntags = len(recs)
    name = "chainrec" if with_rec else "chain"
    print(
        f"{name}: {t*1e3:.3f} ms for {R} walks of {ntags} tags "
        f"-> {t/R/ntags*1e9:.1f} ns/tag",
        flush=True,
    )


# --- vector copy bodies ----------------------------------------------------


def _vcopy_kernel(rec_ref, img_hbm, out_ref, img, sem, *, mode):
    cp = pltpu.make_async_copy(img_hbm, img, sem)
    cp.start()
    cp.wait()
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def body(t, acc):
        dst = rec_ref[t]
        src = rec_ref[t + 8192]
        ln = rec_ref[t + 2 * 8192]
        sw = src >> 2
        dw = dst >> 2
        nw = ((ln + 3) >> 2) + 1
        if mode == "2d":
            sr = sw >> 7
            sl = sw & 127
            r0 = img[pl.ds(sr, 1), :]
            r1 = img[pl.ds(sr + 1, 1), :]
            w = jnp.where(
                lanes < 128 - sl,
                pltpu.roll(r0, (128 - sl) & 127, 1),
                pltpu.roll(r1, (128 - sl) & 127, 1),
            )
            # byte-phase funnel from the next-lane word
            wn = pltpu.roll(w, 127, 1)
            a8 = (src & 3) * 8
            sv = jnp.where(
                a8 == 0,
                w,
                jax.lax.shift_right_logical(w, a8) | (wn << (32 - a8)),
            )
            dr = dw >> 7
            dl = dw & 127
            rolled = pltpu.roll(sv, dl, 1)
            m0 = (lanes >= dl) & (lanes < dl + nw)
            d0 = img[pl.ds(dr, 1), :]
            img[pl.ds(dr, 1), :] = jnp.where(m0, rolled, d0)
            m1 = lanes < dl + nw - 128
            d1 = img[pl.ds(dr + 1, 1), :]
            img[pl.ds(dr + 1, 1), :] = jnp.where(m1, rolled, d1)
            return acc + jnp.sum(rolled & 1)
        else:  # 3d tile mode
            subl = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 1)
            lane3 = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 2)
            st_ = sw >> 10
            srow = (sw >> 7) & 7
            sl = sw & 127
            t0 = img[pl.ds(st_, 1)]
            t1 = img[pl.ds(jnp.minimum(st_ + 1, 15), 1)]
            # rotate sublanes so source row lands at sublane 0/1
            rs0 = pltpu.roll(t0, (8 - srow) & 7, 1)
            rs1 = pltpu.roll(t1, (8 - srow) & 7, 1)
            pair = jnp.where(subl < 8 - srow, rs0, rs1)
            r0 = pair[:, 0:1, :]
            r1 = jnp.where(
                srow == 7, pair[:, 7:8, :], pair[:, 1:2, :]
            )
            w = jnp.where(
                lanes < 128 - sl,
                pltpu.roll(r0, (128 - sl) & 127, 2),
                pltpu.roll(r1, (128 - sl) & 127, 2),
            )
            wn = pltpu.roll(w, 127, 2)
            a8 = (src & 3) * 8
            sv = jnp.where(
                a8 == 0,
                w,
                jax.lax.shift_right_logical(w, a8) | (wn << (32 - a8)),
            )
            dt = dw >> 10
            drow = (dw >> 7) & 7
            dl = dw & 127
            rolled = pltpu.roll(sv, dl, 2)
            span = jnp.where(dl + nw > 128, 1, 0)
            mrow = (lane3 >= jnp.where(subl == drow, dl, 0)) & (
                lane3
                < jnp.where(
                    subl == drow,
                    dl + nw,
                    jnp.where(subl == drow + span, dl + nw - 128, 0),
                )
            )
            dtile = img[pl.ds(dt, 1)]
            img[pl.ds(dt, 1)] = jnp.where(
                mrow, jnp.broadcast_to(rolled, dtile.shape), dtile
            )
            return acc + jnp.sum(rolled & 1)

    acc = jax.lax.fori_loop(0, rec_ref[3 * 8192], body, jnp.int32(0),
                            unroll=False)
    out_ref[0] = acc


def vcopy(mode="2d"):
    _, recs, _, outn = _tags_from_html()
    nrec = len(recs)
    rec = np.zeros(4 * 8192, np.int32)
    # probe uses copy records only, made self-consistently orderable:
    # dst from the real stream, src = dst - off clamped to >= 0
    rec[0:nrec] = recs[:, 0] % (65536 - 600)
    rec[8192 : 8192 + nrec] = np.maximum(recs[:, 1], 0) % (65536 - 600)
    rec[2 * 8192 : 2 * 8192 + nrec] = np.minimum(recs[:, 2], 64)
    rec[3 * 8192] = nrec * 2  # ~2x tags to emulate R batching cost scale
    img = np.arange(16384, dtype=np.int32)
    shape = (128, 128) if mode == "2d" else (16, 8, 128)

    @jax.jit
    def run():
        return pl.pallas_call(
            functools.partial(_vcopy_kernel, mode=mode),
            out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[
                pltpu.VMEM(shape, jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(jnp.asarray(rec), jnp.asarray(img.reshape(shape)))

    t = timeit(run)
    n = int(rec[3 * 8192])
    print(
        f"vcopy[{mode}]: {t*1e3:.3f} ms for {n} records "
        f"-> {t/n*1e9:.1f} ns/record",
        flush=True,
    )


# --- co-issue --------------------------------------------------------------


def _coissue_kernel(seed_ref, out_ref, scratch_smem, vimg, *, nvec):
    s = seed_ref[0]
    scratch_smem[0] = s
    v = vimg[...]

    def body(t, carry):
        acc, v = carry
        # ~24-op scalar dependency chain through SMEM
        x = scratch_smem[t & 63]
        for _ in range(6):
            x = (x * 5 + 1) & 0x7FFFFFFF
            scratch_smem[(t + x) & 63] = x
            x = x ^ scratch_smem[(x >> 3) & 63]
        # independent vector work
        for k in range(nvec):
            v = v * 3 + pltpu.roll(v, 1 + k, 1)
        return acc + x, v

    acc, v = jax.lax.fori_loop(
        0, 8192, body, (jnp.int32(0), v), unroll=False
    )
    vimg[...] = v
    out_ref[0] = acc + jnp.sum(v & 1)


def coissue(nvec):
    @jax.jit
    def run():
        return pl.pallas_call(
            functools.partial(_coissue_kernel, nvec=nvec),
            out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[
                pltpu.SMEM((64,), jnp.int32),
                pltpu.VMEM((8, 128), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(jnp.asarray(np.array([3], np.int32)))

    t = timeit(run)
    print(
        f"coissue[nvec={nvec}]: {t*1e3:.3f} ms for 8192 iters "
        f"-> {t/8192*1e9:.1f} ns/iter",
        flush=True,
    )


def main():
    probes = sys.argv[1:] or ["chain", "chainrec", "vcopy2d", "coissue0",
                              "coissue8"]
    for p in probes:
        try:
            if p == "chain":
                chain(False)
            elif p == "chainrec":
                chain(True)
            elif p == "vcopy2d":
                vcopy("2d")
            elif p == "vcopy3d":
                vcopy("3d")
            elif p.startswith("coissue"):
                coissue(int(p[len("coissue"):] or 0))
            elif p.startswith("iso:"):
                iso(p.split(":", 1)[1])
            elif p == "v5":
                v5()
            elif p == "v5parts":
                v5parts()
            elif p == "v6":
                v6()
            elif p.startswith("bprobe"):
                bprobe(int(p[len("bprobe"):]))
            elif p.startswith("cliff:"):
                cliff(p.split(":", 1)[1])
            elif p == "v7":
                v7(False)
            elif p == "v7u":
                v7(True)
            elif p == "bitonic":
                bitonic()
        except Exception as e:  # noqa: BLE001
            print(f"{p}: FAILED {type(e).__name__}: {str(e)[:500]}",
                  flush=True)




# --- isolation probes (v2): no vector loop-carries, no per-iter
# vector->scalar reductions -------------------------------------------------


def _iso_kernel(rec_ref, img_hbm, out_ref, img, sem, *, mode):
    cp = pltpu.make_async_copy(img_hbm, img, sem)
    cp.start()
    cp.wait()
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def body(t, acc):
        dst = rec_ref[t]
        src = rec_ref[t + 8192]
        ln = rec_ref[t + 2 * 8192]
        if mode == "scalar":
            # pure scalar chain, same record loads, no vector ops at all
            x = (dst * 5 + src) ^ ln
            for _ in range(8):
                x = (x * 5 + 1) & 0x7FFFFFFF
            return acc + x
        sw = src >> 2
        dw = dst >> 2
        nw = ((ln + 3) >> 2) + 1
        sr = sw >> 7
        sl = sw & 127
        dr = dw >> 7
        dl = dw & 127
        if mode == "dynload":
            r0 = img[pl.ds(sr, 1), :]
            img[pl.ds(dr, 1), :] = r0
            return acc + dst
        if mode == "dynload8":
            r0 = img[pl.ds(sr & 120, 8), :]
            img[pl.ds(dr & 120, 8), :] = r0
            return acc + dst
        if mode == "statroll":
            r0 = img[pl.ds(sr, 1), :]
            v = pltpu.roll(r0, 5, 1)
            img[pl.ds(dr, 1), :] = v
            return acc + dst
        if mode == "dynroll":
            r0 = img[pl.ds(sr, 1), :]
            v = pltpu.roll(r0, (128 - sl) & 127, 1)
            img[pl.ds(dr, 1), :] = v
            return acc + dst
        if mode == "full":
            r0 = img[pl.ds(sr, 1), :]
            r1 = img[pl.ds(sr + 1, 1), :]
            w = jnp.where(
                lanes < 128 - sl,
                pltpu.roll(r0, (128 - sl) & 127, 1),
                pltpu.roll(r1, (128 - sl) & 127, 1),
            )
            wn = pltpu.roll(w, 127, 1)
            a8 = (src & 3) * 8
            sv = jnp.where(
                a8 == 0,
                w,
                jax.lax.shift_right_logical(w, a8) | (wn << (32 - a8)),
            )
            rolled = pltpu.roll(sv, dl, 1)
            m0 = (lanes >= dl) & (lanes < dl + nw)
            d0 = img[pl.ds(dr, 1), :]
            img[pl.ds(dr, 1), :] = jnp.where(m0, rolled, d0)
            m1 = lanes < dl + nw - 128
            d1 = img[pl.ds(dr + 1, 1), :]
            img[pl.ds(dr + 1, 1), :] = jnp.where(m1, rolled, d1)
            return acc + dst
        raise ValueError(mode)

    def rep(r, acc):
        return jax.lax.fori_loop(r & 1, rec_ref[3 * 8192], body, acc,
                                 unroll=False)

    acc = jax.lax.fori_loop(0, 20, rep, jnp.int32(0), unroll=False)
    out_ref[0] = acc + jnp.sum(img[pl.ds(0, 1), :] & 1)


def iso(mode):
    _, recs, _, outn = _tags_from_html()
    nrec = len(recs)
    rec = np.zeros(4 * 8192, np.int32)
    rec[0:nrec] = recs[:, 0] % (65536 - 600)
    rec[8192 : 8192 + nrec] = np.maximum(recs[:, 1], 0) % (65536 - 600)
    rec[2 * 8192 : 2 * 8192 + nrec] = np.minimum(recs[:, 2], 64)
    rec[3 * 8192] = nrec

    @jax.jit
    def run():
        return pl.pallas_call(
            functools.partial(_iso_kernel, mode=mode),
            out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[
                pltpu.VMEM((128, 128), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(jnp.asarray(rec), jnp.asarray(np.arange(16384, dtype=np.int32).reshape(128, 128)))

    t = timeit(run)
    print(
        f"iso[{mode}]: {t*1e3:.3f} ms for 20x{nrec} records "
        f"-> {t/20/nrec*1e9:.1f} ns/record",
        flush=True,
    )



# --- v5: XLA-precomputed per-byte tag descriptors + slim scalar walk -------

ERR_TRUNC = 2
ERR_OFF = 3
ERR_LEN = 4
ERR_PRE = 8


def _spec_from_comp(comp):
    """int32[B, CC] packed speculative tag descriptor per byte position.

    literal (bit31=0): adv_total:18 | hdr:3<<18   (hdr 7 = poison)
    copy    (bit31=1): off:16 | len:7<<16 | (adv-2):2<<23 | poison:1<<25
    """
    B, CC = comp.shape
    z = jnp.zeros((B, 4), jnp.int32)
    c = jnp.concatenate([comp, z], axis=1)
    b0 = c[:, 0:CC]
    b1 = c[:, 1 : CC + 1]
    b2 = c[:, 2 : CC + 2]
    b3 = c[:, 3 : CC + 3]
    b4 = c[:, 4 : CC + 4]
    tt = b0 & 3
    l6 = b0 >> 2
    ext = jnp.where(l6 < 60, 0, l6 - 59)
    hdr = 1 + ext
    ext_len = (
        jnp.where(ext >= 1, b1, 0)
        | jnp.where(ext >= 2, b2 << 8, 0)
        | jnp.where(ext >= 3, b3 << 16, 0)
        | jnp.where(ext >= 4, b4 << 24, 0)
    )
    litlen = jnp.where(ext == 0, l6 + 1, ext_len + 1)
    adv_l = hdr + litlen
    pois_l = (adv_l >= (1 << 18)) | (adv_l <= 0)
    lit_word = jnp.where(pois_l, 1 | (7 << 18), adv_l | (hdr << 18))
    len_c = jnp.where(tt == 1, ((b0 >> 2) & 7) + 4, l6 + 1)
    off4 = b1 | (b2 << 8) | (b3 << 16) | (b4 << 24)
    off_c = jnp.where(
        tt == 1,
        ((b0 >> 5) << 8) | b1,
        jnp.where(tt == 2, b1 | (b2 << 8), off4 & 0xFFFF),
    )
    pois_c = (tt == 3) & ((off4 > 0xFFFF) | (off4 < 0))
    advc = jnp.where(tt == 1, 0, jnp.where(tt == 2, 1, 3))
    copy_word = (
        off_c
        | (len_c << 16)
        | (advc << 23)
        | (jnp.where(pois_c, 1, 0) << 25)
        | jnp.int32(-(2**31))
    )
    return jnp.where(tt == 0, lit_word, copy_word)


def _decode_kernel_v5(words_ref, spec_ref, lens_ref, out_ref,
                      outlen_ref, err_ref, img, spec_smem,
                      sem_in, sem_spec, sem_out, *, cc, wc, owc):
    b = pl.program_id(0)
    ob = wc * 4  # byte offset of the output region in the unified image
    oc = owc * 4 - 1024
    n = lens_ref[b]

    cp_in = pltpu.make_async_copy(
        words_ref.at[pl.ds(b * wc, wc)], img.at[pl.ds(0, wc)], sem_in
    )
    cp_in.start()
    cp_sp = pltpu.make_async_copy(
        spec_ref.at[pl.ds(b * cc, cc)], spec_smem, sem_spec
    )
    cp_sp.start()
    cp_in.wait()
    cp_sp.wait()

    def rd(i):
        ii = jnp.clip(i, 0, cc - 1)
        return jax.lax.shift_right_logical(
            img[ii >> 2], (ii & 3) * 8
        ) & 0xFF

    def var_body(state):
        i, val, done, err = state
        byte = rd(i)
        val = val | ((byte & 0x7F) << jnp.minimum(7 * i, 28))
        done = byte < 0x80
        err = jnp.where((i == 4) & (byte >= 8), ERR_PRE, err)
        return i + 1, val, done, err

    def var_cond(state):
        i, val, done, err = state
        return (~done) & (i < 5) & (err == 0)

    pre_len, expected, done, err = jax.lax.while_loop(
        var_cond, var_body, (jnp.int32(0), jnp.int32(0), False, jnp.int32(0))
    )
    err = jnp.where(~done, ERR_PRE, err)
    err = jnp.where(pre_len > n, ERR_PRE, err)
    err = jnp.where(expected > oc, ERR_PRE, err)
    err = jnp.where(expected < 0, ERR_PRE, err)

    def funnel(lo, hi, a8, hs, hm):
        return jax.lax.shift_right_logical(lo, a8) | ((hi << hs) & hm)

    smax = jnp.int32(img.shape[0] - 1)

    def sw(i):
        return img[jnp.clip(i, 0, smax)]

    def append_stream(spos, dpos, K):
        rel = spos - dpos
        a8 = (rel & 3) * 8
        rw = rel >> 2
        hs = (32 - a8) & 31
        hm = jnp.where(a8 == 0, 0, jnp.int32(-1))
        w0 = dpos >> 2
        da8 = (dpos & 3) * 8
        lowmask = (1 << da8) - 1
        base = w0 + rw
        prev = sw(base)
        nxt = sw(base + 1)
        svv = funnel(prev, nxt, a8, hs, hm)
        img[w0] = (img[w0] & lowmask) | (svv & ~lowmask)
        nw = ((dpos + K - 1) >> 2) - w0

        @pl.when(nw > 0)
        def _():
            n2 = sw(base + 2)
            img[w0 + 1] = funnel(nxt, n2, a8, hs, hm)
            n3 = sw(base + 3)
            img[w0 + 2] = funnel(n2, n3, a8, hs, hm)

            @pl.when(nw > 2)
            def _():
                def cp(k, carry):
                    w = w0 + 3 + 2 * k
                    m1 = sw(w + rw + 1)
                    img[w] = funnel(carry, m1, a8, hs, hm)
                    m2 = sw(w + rw + 2)
                    img[w + 1] = funnel(m1, m2, a8, hs, hm)
                    return m2

                jax.lax.fori_loop(0, (nw - 1) >> 1, cp, n3, unroll=False)

    def append_bytes(spos, dpos, K):
        def cpb(k, _):
            q = dpos + k
            s = spos + k
            byte = jax.lax.shift_right_logical(
                img[s >> 2], (s & 3) * 8
            ) & 0xFF
            sh = (q & 3) * 8
            w = q >> 2
            img[w] = (img[w] & ~(0xFF << sh)) | (byte << sh)
            return 0

        jax.lax.fori_loop(0, K, cpb, 0, unroll=False)

    def tag_cond(state):
        ip, op, err = state
        return (ip < n) & (err == 0)

    def tag_body(state):
        ip, op, err = state
        d = spec_smem[ip]
        is_copy = d < 0
        advl = d & 0x3FFFF
        hdrl = jax.lax.shift_right_logical(d, 18) & 7
        off = d & 0xFFFF
        adv = jnp.where(
            is_copy, (jax.lax.shift_right_logical(d, 23) & 3) + 2, advl
        )
        L = jnp.where(
            is_copy, jax.lax.shift_right_logical(d, 16) & 0x7F, advl - hdrl
        )
        src = jnp.where(is_copy, ob + op - off, ip + hdrl)

        e = jnp.where(ip + adv > n, ERR_TRUNC, 0)
        e = jnp.where(
            is_copy & ((off == 0) | (off > op)), ERR_OFF, e
        )
        e = jnp.where(~is_copy & (hdrl >= 6), ERR_LEN, e)
        e = jnp.where(
            is_copy & (jax.lax.shift_right_logical(d, 25) & 1 == 1),
            ERR_OFF,
            e,
        )
        e = jnp.where(op + L > expected, ERR_LEN, e)
        ok = e == 0
        small = is_copy & (off < 8)

        @pl.when(ok & ~small)
        def _():
            append_stream(src, ob + op, L)

        @pl.when(ok & small)
        def _():
            head = jnp.minimum(L, 14)
            append_bytes(src, ob + op, head)

            @pl.when(L > 14)
            def _():
                off2 = off * (14 // jnp.maximum(off, 1))
                append_stream(ob + op + 14 - off2, ob + op + 14, L - 14)

        return ip + adv, op + jnp.where(ok, L, 0), e

    ip, op, err = jax.lax.while_loop(
        tag_cond, tag_body, (pre_len, jnp.int32(0), err)
    )
    err = jnp.where((err == 0) & (op != expected), ERR_LEN, err)
    outlen_ref[b] = jnp.where(err == 0, expected, 0)
    err_ref[b] = err

    cp_out = pltpu.make_async_copy(
        img.at[pl.ds(wc, owc)], out_ref.at[pl.ds(b * owc, owc)], sem_out
    )
    cp_out.start()
    cp_out.wait()


@functools.partial(jax.jit, static_argnames=("out_cap",))
def decode_v5(comp, comp_lens, out_cap):
    comp = comp.astype(jnp.int32)
    B, CC = comp.shape
    assert CC % 1024 == 0 and out_cap % 1024 == 0
    spec = _spec_from_comp(comp)
    words = (
        comp.reshape(B, CC // 4, 4)
        * jnp.array([1, 1 << 8, 1 << 16, 1 << 24], jnp.int32)
    ).sum(axis=2, dtype=jnp.int32)
    wc = -(-(CC // 4) // 1024) * 1024
    words = jnp.concatenate(
        [words, jnp.zeros((B, wc - CC // 4), jnp.int32)], axis=1
    )
    owc = -(-(out_cap + 1024) // 4 // 1024) * 1024
    kern = functools.partial(_decode_kernel_v5, cc=CC, wc=wc, owc=owc)
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
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.SMEM((wc + owc,), jnp.int32),
            pltpu.SMEM((CC,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        words.reshape(-1),
        spec.reshape(-1),
        comp_lens.astype(jnp.int32),
    )
    ow = ow_flat.reshape(B, owc)
    sh = jnp.arange(4, dtype=jnp.int32) * 8
    by = (
        jax.lax.shift_right_logical(ow[:, :, None], sh[None, None, :]) & 0xFF
    ).reshape(B, owc * 4)
    return by[:, :out_cap], out_lens, errs


def v5():
    from perf_probe import build_blocks

    B = 128
    frags, comp, lens, ntags, hist = build_blocks(B)
    comp_d = jax.device_put(jnp.asarray(comp))
    lens_d = jax.device_put(jnp.asarray(lens))
    from snappier_tpu.constants import BLOCK_SIZE

    fn = lambda: decode_v5(comp_d, lens_d, BLOCK_SIZE)
    outs, out_lens, errs = fn()
    errs_h = np.asarray(errs)
    ok = int(errs_h.max()) == 0
    if ok:
        for i in (0, 1, B // 2, B - 1):
            ok = ok and (np.asarray(outs[i])[:BLOCK_SIZE] == frags[i]).all()
    t = timeit(fn)
    gb = B * BLOCK_SIZE / 1e9
    print(
        f"v5: {'OK ' if ok else 'BAD'} {t*1e3:.2f} ms, "
        f"{t/B*1e6:.0f} us/block, {gb/t:.3f} GB/s, "
        f"{t/B/ntags*1e9:.0f} ns/tag (mix {hist})",
        flush=True,
    )



def v5parts():
    from perf_probe import build_blocks

    B = 128
    frags, comp, lens, ntags, hist = build_blocks(B)
    comp_d = jax.device_put(jnp.asarray(comp))
    lens_d = jax.device_put(jnp.asarray(lens))
    from snappier_tpu.constants import BLOCK_SIZE

    CC = comp.shape[1]
    wc = -(-(CC // 4) // 1024) * 1024
    owc = -(-(BLOCK_SIZE + 1024) // 4 // 1024) * 1024

    @jax.jit
    def pre(c):
        spec = _spec_from_comp(c.astype(jnp.int32))
        words = (
            c.astype(jnp.int32).reshape(B, CC // 4, 4)
            * jnp.array([1, 1 << 8, 1 << 16, 1 << 24], jnp.int32)
        ).sum(axis=2, dtype=jnp.int32)
        words = jnp.concatenate(
            [words, jnp.zeros((B, wc - CC // 4), jnp.int32)], axis=1
        )
        return spec.reshape(-1), words.reshape(-1), spec.sum()

    spec_d, words_d, _ = pre(comp_d)
    spec_d.block_until_ready()

    t_pre = timeit(lambda: pre(comp_d))
    print(f"v5 pre-pass alone: {t_pre*1e3:.2f} ms ({t_pre/B*1e6:.0f} us/block)",
          flush=True)

    kern = functools.partial(_decode_kernel_v5, cc=CC, wc=wc, owc=owc)

    @jax.jit
    def kernel_only(words, spec, lens):
        return pl.pallas_call(
            kern,
            grid=(B,),
            out_shape=(
                jax.ShapeDtypeStruct((B * owc,), jnp.int32),
                jax.ShapeDtypeStruct((B,), jnp.int32),
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
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            scratch_shapes=[
                pltpu.SMEM((wc + owc,), jnp.int32),
                pltpu.SMEM((CC,), jnp.int32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(words, spec, lens)

    outs, out_lens, errs = kernel_only(words_d, spec_d, lens_d)
    ok = int(np.asarray(errs).max()) == 0
    t_k = timeit(lambda: kernel_only(words_d, spec_d, lens_d))
    print(
        f"v5 kernel alone: {'OK ' if ok else 'BAD'} {t_k*1e3:.2f} ms "
        f"({t_k/B*1e6:.0f} us/block, {t_k/B/ntags*1e9:.0f} ns/tag)",
        flush=True,
    )



# --- v6: word-based pre-pass + slimmer walk --------------------------------


def _spec_from_words(words, CC):
    """Same packed descriptor as _spec_from_comp, computed from the
    packed word image with static per-phase shifts (no misaligned byte
    slices — those defeat XLA fusion and cost ~100 us/block)."""
    B, WC = words.shape
    zero = jnp.zeros((B, 1), jnp.int32)
    wn1 = jnp.concatenate([words[:, 1:], zero], axis=1)
    wn2 = jnp.concatenate([words[:, 2:], zero, zero], axis=1)

    def bcast(w):  # (B, WC) -> (B, WC*4) repeating each word 4x
        return jnp.broadcast_to(w[:, :, None], (B, WC, 4)).reshape(B, WC * 4)

    w0 = bcast(words)[:, :CC]
    w1 = bcast(wn1)[:, :CC]
    w2 = bcast(wn2)[:, :CC]
    ph = jnp.tile(jnp.arange(4, dtype=jnp.int32), WC)[None, :CC] * 8
    # v64 bytes [i, i+8): low word v32 = bytes i..i+3, high = i+4..i+7
    lo = jax.lax.shift_right_logical(w0, ph)
    v32 = jnp.where(ph == 0, w0, lo | (w1 << (32 - ph)))
    hi32 = jnp.where(
        ph == 0, w1, jax.lax.shift_right_logical(w1, ph) | (w2 << (32 - ph))
    )
    b0 = v32 & 0xFF
    b1 = jax.lax.shift_right_logical(v32, 8) & 0xFF
    b2 = jax.lax.shift_right_logical(v32, 16) & 0xFF
    b3 = jax.lax.shift_right_logical(v32, 24) & 0xFF
    b4 = hi32 & 0xFF
    tt = b0 & 3
    l6 = jax.lax.shift_right_logical(b0, 2)
    ext = jnp.where(l6 < 60, 0, l6 - 59)
    hdr = 1 + ext
    ext_len = (
        jnp.where(ext >= 1, b1, 0)
        | jnp.where(ext >= 2, b2 << 8, 0)
        | jnp.where(ext >= 3, b3 << 16, 0)
        | jnp.where(ext >= 4, b4 << 24, 0)
    )
    litlen = jnp.where(ext == 0, l6 + 1, ext_len + 1)
    adv_l = hdr + litlen
    pois_l = (adv_l >= (1 << 18)) | (adv_l <= 0)
    lit_word = jnp.where(pois_l, 1 | (7 << 18), adv_l | (hdr << 18))
    len_c = jnp.where(tt == 1, (l6 & 7) + 4, l6 + 1)
    off4 = b1 | (b2 << 8) | (b3 << 16) | (b4 << 24)
    off_c = jnp.where(
        tt == 1,
        (jax.lax.shift_right_logical(b0, 5) << 8) | b1,
        jnp.where(tt == 2, b1 | (b2 << 8), off4 & 0xFFFF),
    )
    pois_c = (tt == 3) & ((off4 > 0xFFFF) | (off4 < 0))
    advc = jnp.where(tt == 1, 0, jnp.where(tt == 2, 1, 3))
    copy_word = (
        off_c
        | (len_c << 16)
        | (advc << 23)
        | (jnp.where(pois_c, 1, 0) << 25)
        | jnp.int32(-(2**31))
    )
    return jnp.where(tt == 0, lit_word, copy_word)


def _decode_kernel_v6(words_ref, spec_ref, lens_ref, out_ref,
                      outlen_ref, err_ref, img, spec_smem,
                      sem_in, sem_spec, sem_out, *, cc, wc, owc):
    b = pl.program_id(0)
    ob = wc * 4
    oc = owc * 4 - 1024
    n = lens_ref[b]

    cp_in = pltpu.make_async_copy(
        words_ref.at[pl.ds(b * wc, wc)], img.at[pl.ds(0, wc)], sem_in
    )
    cp_in.start()
    cp_sp = pltpu.make_async_copy(
        spec_ref.at[pl.ds(b * cc, cc)], spec_smem, sem_spec
    )
    cp_sp.start()
    cp_in.wait()
    cp_sp.wait()

    def rd(i):
        ii = jnp.clip(i, 0, cc - 1)
        return jax.lax.shift_right_logical(
            img[ii >> 2], (ii & 3) * 8
        ) & 0xFF

    def var_body(state):
        i, val, done, err = state
        byte = rd(i)
        val = val | ((byte & 0x7F) << jnp.minimum(7 * i, 28))
        done = byte < 0x80
        err = jnp.where((i == 4) & (byte >= 8), ERR_PRE, err)
        return i + 1, val, done, err

    def var_cond(state):
        i, val, done, err = state
        return (~done) & (i < 5) & (err == 0)

    pre_len, expected, done, err = jax.lax.while_loop(
        var_cond, var_body, (jnp.int32(0), jnp.int32(0), False, jnp.int32(0))
    )
    err = jnp.where(~done, ERR_PRE, err)
    err = jnp.where(pre_len > n, ERR_PRE, err)
    err = jnp.where(expected > oc, ERR_PRE, err)
    err = jnp.where(expected < 0, ERR_PRE, err)

    def funnel(lo, hi, a8, hs, hm):
        return jax.lax.shift_right_logical(lo, a8) | ((hi << hs) & hm)

    smax = jnp.int32(img.shape[0] - 1)

    def sw(i):
        return img[jnp.clip(i, 0, smax)]

    def append_stream(spos, dpos, K):
        rel = spos - dpos
        a8 = (rel & 3) * 8
        rw = rel >> 2
        hs = (32 - a8) & 31
        hm = jnp.where(a8 == 0, 0, jnp.int32(-1))
        w0 = dpos >> 2
        da8 = (dpos & 3) * 8
        lowmask = (1 << da8) - 1
        base = w0 + rw
        prev = sw(base)
        nxt = sw(base + 1)
        svv = funnel(prev, nxt, a8, hs, hm)
        img[w0] = (img[w0] & lowmask) | (svv & ~lowmask)
        # Unconditional pair (nw <= 2 is the mode; over-store is safe).
        n2 = sw(base + 2)
        img[w0 + 1] = funnel(nxt, n2, a8, hs, hm)
        n3 = sw(base + 3)
        img[w0 + 2] = funnel(n2, n3, a8, hs, hm)
        nw = ((dpos + K - 1) >> 2) - w0

        @pl.when(nw > 2)
        def _():
            n4 = sw(base + 4)
            img[w0 + 3] = funnel(n3, n4, a8, hs, hm)
            n5 = sw(base + 5)
            img[w0 + 4] = funnel(n4, n5, a8, hs, hm)

            @pl.when(nw > 4)
            def _():
                def cp(k, carry):
                    w = w0 + 5 + 2 * k
                    m1 = sw(w + rw + 1)
                    img[w] = funnel(carry, m1, a8, hs, hm)
                    m2 = sw(w + rw + 2)
                    img[w + 1] = funnel(m1, m2, a8, hs, hm)
                    return m2

                jax.lax.fori_loop(0, (nw - 3) >> 1, cp, n5, unroll=False)

    def append_bytes(spos, dpos, K):
        def cpb(k, _):
            q = dpos + k
            s = spos + k
            byte = jax.lax.shift_right_logical(
                img[s >> 2], (s & 3) * 8
            ) & 0xFF
            sh = (q & 3) * 8
            w = q >> 2
            img[w] = (img[w] & ~(0xFF << sh)) | (byte << sh)
            return 0

        jax.lax.fori_loop(0, K, cpb, 0, unroll=False)

    def tag_cond(state):
        ip, op, err = state
        return (ip < n) & (err == 0)

    def tag_body(state):
        ip, op, err = state
        d = spec_smem[ip]
        is_copy = d < 0
        advl = d & 0x3FFFF
        hdrl = jax.lax.shift_right_logical(d, 18) & 7
        off = d & 0xFFFF
        adv = jnp.where(
            is_copy, (jax.lax.shift_right_logical(d, 23) & 3) + 2, advl
        )
        L = jnp.where(
            is_copy, jax.lax.shift_right_logical(d, 16) & 0x7F, advl - hdrl
        )
        src = jnp.where(is_copy, ob + op - off, ip + hdrl)

        e = jnp.where(ip + adv > n, ERR_TRUNC, 0)
        e = jnp.where(
            is_copy & ((off == 0) | (off > op)), ERR_OFF, e
        )
        e = jnp.where(~is_copy & (hdrl >= 6), ERR_LEN, e)
        e = jnp.where(
            is_copy & (jax.lax.shift_right_logical(d, 25) & 1 == 1),
            ERR_OFF,
            e,
        )
        e = jnp.where(op + L > expected, ERR_LEN, e)
        # Clamp instead of gating: appends stay in-image even on bad
        # tags (whose output is discarded), so the branches below do
        # not need `e == 0`.
        Lc_ = jnp.minimum(L, expected - op)
        Lc_ = jnp.maximum(Lc_, 0)
        src = jnp.maximum(src, 0)
        small = is_copy & (off < 8)

        @pl.when(~small)
        def _():
            append_stream(src, ob + op, Lc_)

        @pl.when(small)
        def _():
            head = jnp.minimum(Lc_, 14)
            append_bytes(src, ob + op, head)

            @pl.when(Lc_ > 14)
            def _():
                off2 = off * (14 // jnp.maximum(off, 1))
                append_stream(ob + op + 14 - off2, ob + op + 14, Lc_ - 14)

        return ip + adv, op + Lc_, e

    ip, op, err = jax.lax.while_loop(
        tag_cond, tag_body, (pre_len, jnp.int32(0), err)
    )
    err = jnp.where((err == 0) & (op != expected), ERR_LEN, err)
    outlen_ref[b] = jnp.where(err == 0, expected, 0)
    err_ref[b] = err

    cp_out = pltpu.make_async_copy(
        img.at[pl.ds(wc, owc)], out_ref.at[pl.ds(b * owc, owc)], sem_out
    )
    cp_out.start()
    cp_out.wait()


@functools.partial(jax.jit, static_argnames=("out_cap",))
def decode_v6(comp, comp_lens, out_cap):
    comp = comp.astype(jnp.int32)
    B, CC = comp.shape
    assert CC % 1024 == 0 and out_cap % 1024 == 0
    words = (
        comp.reshape(B, CC // 4, 4)
        * jnp.array([1, 1 << 8, 1 << 16, 1 << 24], jnp.int32)
    ).sum(axis=2, dtype=jnp.int32)
    spec = _spec_from_words(words, CC)
    wc = -(-(CC // 4) // 1024) * 1024
    words = jnp.concatenate(
        [words, jnp.zeros((B, wc - CC // 4), jnp.int32)], axis=1
    )
    owc = -(-(out_cap + 1024) // 4 // 1024) * 1024
    kern = functools.partial(_decode_kernel_v6, cc=CC, wc=wc, owc=owc)
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
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.SMEM((wc + owc,), jnp.int32),
            pltpu.SMEM((CC,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        words.reshape(-1),
        spec.reshape(-1),
        comp_lens.astype(jnp.int32),
    )
    ow = ow_flat.reshape(B, owc)
    sh = jnp.arange(4, dtype=jnp.int32) * 8
    by = (
        jax.lax.shift_right_logical(ow[:, :, None], sh[None, None, :]) & 0xFF
    ).reshape(B, owc * 4)
    return by[:, :out_cap], out_lens, errs


def v6():
    from perf_probe import build_blocks

    B = 128
    frags, comp, lens, ntags, hist = build_blocks(B)
    comp_d = jax.device_put(jnp.asarray(comp))
    lens_d = jax.device_put(jnp.asarray(lens))
    from snappier_tpu.constants import BLOCK_SIZE

    fn = lambda: decode_v6(comp_d, lens_d, BLOCK_SIZE)
    outs, out_lens, errs = fn()
    errs_h = np.asarray(errs)
    ok = int(errs_h.max()) == 0
    if ok:
        for i in (0, 1, B // 2, B - 1):
            ok = ok and (np.asarray(outs[i])[:BLOCK_SIZE] == frags[i]).all()
    t = timeit(fn)
    gb = B * BLOCK_SIZE / 1e9
    print(
        f"v6: {'OK ' if ok else 'BAD'} {t*1e3:.2f} ms, "
        f"{t/B*1e6:.0f} us/block, {gb/t:.3f} GB/s, "
        f"{t/B/ntags*1e9:.0f} ns/tag",
        flush=True,
    )



# --- branch-cost microprobe + v6 branch-structure variants -----------------


def _bprobe_kernel(seed_ref, out_ref, scratch, *, nwhen):
    scratch[0] = seed_ref[0]

    def body(t, acc):
        x = scratch[t & 63] ^ t
        for _ in range(4):
            x = (x + (x >> 3)) & 0x7FFFFFFF
        if nwhen:
            for k in range(nwhen):
                @pl.when(((x >> k) & 1) == 1)
                def _():
                    scratch[(t + k) & 63] = x + k
        else:
            for k in range(3):
                scratch[(t + k) & 63] = jnp.where(
                    ((x >> k) & 1) == 1, x + k, scratch[(t + k) & 63]
                )
        return acc + x

    acc = jax.lax.fori_loop(0, 524288, body, jnp.int32(0), unroll=False)
    out_ref[0] = acc


def bprobe(nwhen):
    @jax.jit
    def run():
        return pl.pallas_call(
            functools.partial(_bprobe_kernel, nwhen=nwhen),
            out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.SMEM((64,), jnp.int32)],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(jnp.asarray(np.array([3], np.int32)))

    t = timeit(run)
    print(
        f"bprobe[nwhen={nwhen}]: {t/524288*1e9:.1f} ns/iter",
        flush=True,
    )



# --- v7: two-array spec, off=0 poison, single-bool checks ------------------


def _spec2_from_words(words, CC):
    """Two per-byte descriptor arrays:

    spec0: adv:18 | F:7<<18 | small:1<<30 | is_copy:1<<31
           (F = hdr for literals, len for copies; L = copy ? F : adv-F)
    spec1: src_rel (literal: hdr, add ip; copy: -off, add ob+op)

    Poisoned positions (bad copy4 offset, oversize literal length)
    become copies with off=0, which the walk's off-1 check rejects.
    """
    B, WC = words.shape
    zero = jnp.zeros((B, 1), jnp.int32)
    wn1 = jnp.concatenate([words[:, 1:], zero], axis=1)
    wn2 = jnp.concatenate([words[:, 2:], zero, zero], axis=1)

    def bcast(w):
        return jnp.broadcast_to(w[:, :, None], (B, WC, 4)).reshape(B, WC * 4)

    w0 = bcast(words)[:, :CC]
    w1 = bcast(wn1)[:, :CC]
    w2 = bcast(wn2)[:, :CC]
    ph = jnp.tile(jnp.arange(4, dtype=jnp.int32), WC)[None, :CC] * 8
    lo = jax.lax.shift_right_logical(w0, ph)
    v32 = jnp.where(ph == 0, w0, lo | (w1 << (32 - ph)))
    hi32 = jnp.where(
        ph == 0, w1, jax.lax.shift_right_logical(w1, ph) | (w2 << (32 - ph))
    )
    b0 = v32 & 0xFF
    b1 = jax.lax.shift_right_logical(v32, 8) & 0xFF
    b2 = jax.lax.shift_right_logical(v32, 16) & 0xFF
    b3 = jax.lax.shift_right_logical(v32, 24) & 0xFF
    b4 = hi32 & 0xFF
    tt = b0 & 3
    l6 = jax.lax.shift_right_logical(b0, 2)
    ext = jnp.where(l6 < 60, 0, l6 - 59)
    hdr = 1 + ext
    ext_len = (
        jnp.where(ext >= 1, b1, 0)
        | jnp.where(ext >= 2, b2 << 8, 0)
        | jnp.where(ext >= 3, b3 << 16, 0)
        | jnp.where(ext >= 4, b4 << 24, 0)
    )
    litlen = jnp.where(ext == 0, l6 + 1, ext_len + 1)
    adv_l = hdr + litlen
    pois_l = (adv_l >= (1 << 18)) | (adv_l <= 0)
    len_c = jnp.where(tt == 1, (l6 & 7) + 4, l6 + 1)
    off4 = b1 | (b2 << 8) | (b3 << 16) | (b4 << 24)
    off_c = jnp.where(
        tt == 1,
        (jax.lax.shift_right_logical(b0, 5) << 8) | b1,
        jnp.where(tt == 2, b1 | (b2 << 8), off4 & 0xFFFF),
    )
    pois_c = (tt == 3) & ((off4 > 0xFFFF) | (off4 < 0))
    off_c = jnp.where(pois_c, 0, off_c)
    adv_c = jnp.where(tt == 1, 2, jnp.where(tt == 2, 3, 5))
    is_lit = (tt == 0) & ~pois_l
    adv = jnp.where(is_lit, adv_l, jnp.where(tt == 0, 1, adv_c))
    F = jnp.where(is_lit, hdr, jnp.where(tt == 0, 4, len_c))
    off_c = jnp.where((tt == 0) & pois_l, 0, off_c)
    small = ~is_lit & (off_c < 8)
    spec0 = (
        adv
        | (F << 18)
        | (jnp.where(small, 1, 0) << 30)
        | jnp.where(is_lit, 0, jnp.int32(-(2**31)))
    )
    spec1 = jnp.where(is_lit, hdr, -off_c)
    return spec0, spec1


def _decode_kernel_v7(words_ref, spec0_ref, spec1_ref, lens_ref, out_ref,
                      outlen_ref, err_ref, img, s0_smem, s1_smem,
                      sem_in, sem_s0, sem_s1, sem_out, *, cc, wc, owc,
                      unroll2=False):
    b = pl.program_id(0)
    ob = wc * 4
    oc = owc * 4 - 1024
    n = lens_ref[b]

    cp_in = pltpu.make_async_copy(
        words_ref.at[pl.ds(b * wc, wc)], img.at[pl.ds(0, wc)], sem_in
    )
    cp_in.start()
    cp_s0 = pltpu.make_async_copy(
        spec0_ref.at[pl.ds(b * cc, cc)], s0_smem, sem_s0
    )
    cp_s0.start()
    cp_s1 = pltpu.make_async_copy(
        spec1_ref.at[pl.ds(b * cc, cc)], s1_smem, sem_s1
    )
    cp_s1.start()
    cp_in.wait()
    cp_s0.wait()
    cp_s1.wait()

    def rd(i):
        ii = jnp.clip(i, 0, cc - 1)
        return jax.lax.shift_right_logical(
            img[ii >> 2], (ii & 3) * 8
        ) & 0xFF

    def var_body(state):
        i, val, done, err = state
        byte = rd(i)
        val = val | ((byte & 0x7F) << jnp.minimum(7 * i, 28))
        done = byte < 0x80
        err = jnp.where((i == 4) & (byte >= 8), ERR_PRE, err)
        return i + 1, val, done, err

    def var_cond(state):
        i, val, done, err = state
        return (~done) & (i < 5) & (err == 0)

    pre_len, expected, done, err = jax.lax.while_loop(
        var_cond, var_body, (jnp.int32(0), jnp.int32(0), False, jnp.int32(0))
    )
    err = jnp.where(~done, ERR_PRE, err)
    err = jnp.where(pre_len > n, ERR_PRE, err)
    err = jnp.where(expected > oc, ERR_PRE, err)
    err = jnp.where(expected < 0, ERR_PRE, err)

    def funnel(lo, hi, a8, hs, hm):
        return jax.lax.shift_right_logical(lo, a8) | ((hi << hs) & hm)

    def sw(i):
        return img[i]

    def append_stream(spos, dpos, K):
        rel = spos - dpos
        a8 = (rel & 3) * 8
        rw = rel >> 2
        hs = (32 - a8) & 31
        hm = jnp.where(a8 == 0, 0, jnp.int32(-1))
        w0 = dpos >> 2
        da8 = (dpos & 3) * 8
        lowmask = (1 << da8) - 1
        base = w0 + rw
        prev = sw(jnp.maximum(base, 0))
        nxt = sw(base + 1)
        svv = funnel(prev, nxt, a8, hs, hm)
        img[w0] = (img[w0] & lowmask) | (svv & ~lowmask)
        nw = ((dpos + K - 1) >> 2) - w0

        @pl.when(nw > 0)
        def _():
            n2 = sw(base + 2)
            img[w0 + 1] = funnel(nxt, n2, a8, hs, hm)
            n3 = sw(base + 3)
            img[w0 + 2] = funnel(n2, n3, a8, hs, hm)

            @pl.when(nw > 2)
            def _():
                n4 = sw(base + 4)
                img[w0 + 3] = funnel(n3, n4, a8, hs, hm)
                n5 = sw(base + 5)
                img[w0 + 4] = funnel(n4, n5, a8, hs, hm)

                @pl.when(nw > 4)
                def _():
                    def cp(k, carry):
                        w = w0 + 5 + 2 * k
                        m1 = sw(w + rw + 1)
                        img[w] = funnel(carry, m1, a8, hs, hm)
                        m2 = sw(w + rw + 2)
                        img[w + 1] = funnel(m1, m2, a8, hs, hm)
                        return m2

                    jax.lax.fori_loop(0, (nw - 3) >> 1, cp, n5,
                                      unroll=False)

    def append_bytes(spos, dpos, K):
        def cpb(k, _):
            q = dpos + k
            s = spos + k
            byte = jax.lax.shift_right_logical(
                img[s >> 2], (s & 3) * 8
            ) & 0xFF
            sh = (q & 3) * 8
            w = q >> 2
            img[w] = (img[w] & ~(0xFF << sh)) | (byte << sh)
            return 0

        jax.lax.fori_loop(0, K, cpb, 0, unroll=False)

    def tag_cond(state):
        ip, op, bad = state
        return (ip < n) & ~bad

    def do_tag(ip, op):
        d0 = s0_smem[ip]
        d1 = s1_smem[ip]
        is_copy = d0 < 0
        adv = d0 & 0x3FFFF
        F = jax.lax.shift_right_logical(d0, 18) & 0x7F
        L = jnp.where(is_copy, F, adv - F)
        src = jnp.where(is_copy, ob + op, ip) + d1
        # single-bool validity: -d1 = off; off-1 >= op (incl. off==0
        # via wraparound to -1 < 0 ... two compares) | overrun | trunc
        offm1 = -d1 - 1
        bad = (ip + adv > n) | (op + L > expected)
        bad = bad | (is_copy & ((offm1 >= op) | (offm1 < 0)))
        Lc_ = jnp.clip(L, 0, expected - op)
        small = (d0 & (1 << 30)) != 0

        @pl.when(~small)
        def _():
            append_stream(jnp.maximum(src, 0), ob + op, Lc_)

        @pl.when(small)
        def _():
            head = jnp.minimum(Lc_, 14)
            off = -d1
            append_bytes(jnp.maximum(src, 0), ob + op, head)

            @pl.when(Lc_ > 14)
            def _():
                off2 = off * (14 // jnp.maximum(off, 1))
                append_stream(ob + op + 14 - off2, ob + op + 14, Lc_ - 14)

        return ip + adv, op + Lc_, bad

    if unroll2:
        def tag_body(state):
            ip, op, bad = state
            ip1, op1, bad1 = do_tag(ip, op)

            def second():
                ip2, op2, bad2 = do_tag(ip1, op1)
                return ip2, op2, bad2

            return jax.lax.cond(
                (ip1 < n) & ~bad1,
                second,
                lambda: (ip1, op1, bad1),
            )
    else:
        def tag_body(state):
            ip, op, bad = state
            return do_tag(ip, op)

    ip, op, bad = jax.lax.while_loop(
        tag_cond, tag_body, (pre_len, jnp.int32(0), err != 0)
    )
    # Post-loop error classification: one re-parse of the failing tag.
    e = err

    @pl.when((e == 0) & bad)
    def classify():
        pass

    d0 = s0_smem[jnp.clip(ip - 0, 0, cc - 1)]
    # Classification without position rewind is ambiguous; report the
    # generic stream error for any bad tag (API maps all to
    # InvalidDataError).
    e = jnp.where((e == 0) & bad, ERR_LEN, e)
    e = jnp.where((e == 0) & (op != expected), ERR_LEN, e)
    outlen_ref[b] = jnp.where(e == 0, expected, 0)
    err_ref[b] = e

    cp_out = pltpu.make_async_copy(
        img.at[pl.ds(wc, owc)], out_ref.at[pl.ds(b * owc, owc)], sem_out
    )
    cp_out.start()
    cp_out.wait()


@functools.partial(jax.jit, static_argnames=("out_cap", "unroll2"))
def decode_v7(comp, comp_lens, out_cap, unroll2=False):
    comp = comp.astype(jnp.int32)
    B, CC = comp.shape
    assert CC % 1024 == 0 and out_cap % 1024 == 0
    words = (
        comp.reshape(B, CC // 4, 4)
        * jnp.array([1, 1 << 8, 1 << 16, 1 << 24], jnp.int32)
    ).sum(axis=2, dtype=jnp.int32)
    spec0, spec1 = _spec2_from_words(words, CC)
    wc = -(-(CC // 4) // 1024) * 1024
    words = jnp.concatenate(
        [words, jnp.zeros((B, wc - CC // 4), jnp.int32)], axis=1
    )
    owc = -(-(out_cap + 1024) // 4 // 1024) * 1024
    kern = functools.partial(
        _decode_kernel_v7, cc=CC, wc=wc, owc=owc, unroll2=unroll2
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
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.SMEM((wc + owc + 8,), jnp.int32),
            pltpu.SMEM((CC,), jnp.int32),
            pltpu.SMEM((CC,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        words.reshape(-1),
        spec0.reshape(-1),
        spec1.reshape(-1),
        comp_lens.astype(jnp.int32),
    )
    ow = ow_flat.reshape(B, owc)
    sh = jnp.arange(4, dtype=jnp.int32) * 8
    by = (
        jax.lax.shift_right_logical(ow[:, :, None], sh[None, None, :]) & 0xFF
    ).reshape(B, owc * 4)
    return by[:, :out_cap], out_lens, errs


def v7(unroll2=False):
    from perf_probe import build_blocks

    B = 128
    frags, comp, lens, ntags, hist = build_blocks(B)
    comp_d = jax.device_put(jnp.asarray(comp))
    lens_d = jax.device_put(jnp.asarray(lens))
    from snappier_tpu.constants import BLOCK_SIZE

    fn = lambda: decode_v7(comp_d, lens_d, BLOCK_SIZE, unroll2)
    outs, out_lens, errs = fn()
    errs_h = np.asarray(errs)
    ok = int(errs_h.max()) == 0
    if ok:
        for i in (0, 1, B // 2, B - 1):
            ok = ok and (np.asarray(outs[i])[:BLOCK_SIZE] == frags[i]).all()
    t = timeit(fn)
    gb = B * BLOCK_SIZE / 1e9
    name = "v7u" if unroll2 else "v7"
    print(
        f"{name}: {'OK ' if ok else 'BAD'} {t*1e3:.2f} ms, "
        f"{t/B*1e6:.0f} us/block, {gb/t:.3f} GB/s, "
        f"{t/B/ntags*1e9:.0f} ns/tag",
        flush=True,
    )



# --- cliff search: where does the 20ns walk become a 100ns walk? -----------


def _cliff_kernel(adv_ref, meta_ref, out_ref, adv_smem, img, sem, *, mode):
    cp = pltpu.make_async_copy(adv_ref, adv_smem, sem)
    cp.start()
    cp.wait()
    n = meta_ref[0]
    start = meta_ref[1]

    def trial(r, acc):
        def cond(st):
            ip, op, t = st
            return ip < n

        def body(st):
            ip, op, t = st
            a = adv_smem[ip]
            if mode == "when1":
                @pl.when(a > 3)
                def _():
                    img[op & 16383] = a
            elif mode == "when2":
                @pl.when(a > 2)
                def _():
                    img[op & 16383] = a
                    img[(op + 1) & 16383] = a ^ ip

                    @pl.when(a > 13)
                    def _():
                        img[(op + 2) & 16383] = a + ip
                        img[(op + 3) & 16383] = a - ip
            elif mode == "fori":
                @pl.when(a > 2)
                def _():
                    def cp_(k, carry):
                        img[(op + k) & 16383] = carry + k
                        return carry ^ k

                    jax.lax.fori_loop(0, a & 7, cp_, a, unroll=False)
            elif mode == "store4":
                img[op & 16383] = a
                img[(op + 1) & 16383] = a ^ ip
                img[(op + 2) & 16383] = a + ip
                img[(op + 3) & 16383] = a - ip
            elif mode == "load4":
                s_ = img[(op - a) & 16383]
                s2 = img[(op - a + 1) & 16383]
                img[op & 16383] = s_
                img[(op + 1) & 16383] = s2
            return ip + a, op + a, t + 1

        ip, op, t = jax.lax.while_loop(
            cond, body, (start + (r & 1), jnp.int32(0), jnp.int32(0))
        )
        return acc + ip + t

    acc = jax.lax.fori_loop(0, R, trial, jnp.int32(0), unroll=False)
    out_ref[0] = acc + img[0]


def cliff(mode):
    adv, recs, n, _ = _tags_from_html()
    pad = -(-len(adv) // 1024) * 1024
    advp = np.zeros(pad, np.int32)
    advp[: len(adv)] = adv
    meta = jnp.asarray(np.array([n, 3], np.int32))

    @jax.jit
    def run():
        return pl.pallas_call(
            functools.partial(_cliff_kernel, mode=mode),
            out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[
                pltpu.SMEM((pad,), jnp.int32),
                pltpu.SMEM((16384,), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(jnp.asarray(advp), meta)

    t = timeit(run)
    ntags = len(recs)
    print(
        f"cliff[{mode}]: {t/R/ntags*1e9:.1f} ns/tag",
        flush=True,
    )



# --- bitonic: in-kernel 64K sort probe (round-3 #3 derisk) -----------------


def _bitonic_kernel(x_ref, out_ref, keys, vals):
    keys[...] = x_ref[...]
    vals[...] = jax.lax.broadcasted_iota(jnp.int32, (512, 128), 0) * 128 + \
        jax.lax.broadcasted_iota(jnp.int32, (512, 128), 1)
    # flat index of element (r, c) = r * 128 + c; bitonic network over
    # 65536 elements. Strides >= 128 permute rows (static slicing);
    # strides < 128 permute lanes via reshape butterflies.
    flat_r = jax.lax.broadcasted_iota(jnp.int32, (512, 128), 0)
    flat_c = jax.lax.broadcasted_iota(jnp.int32, (512, 128), 1)
    idx = flat_r * 128 + flat_c

    def stage(k, j):
        # compare-exchange partner = idx ^ j; ascending iff bit k+1 of
        # idx is 0 (standard bitonic for n = power of two).
        K = keys[...]
        V = vals[...]
        def swap2(A, axis, shape):
            Ap = A.reshape(shape)
            lo = jax.lax.slice_in_dim(Ap, 0, 1, axis=axis)
            hi = jax.lax.slice_in_dim(Ap, 1, 2, axis=axis)
            return jnp.concatenate([hi, lo], axis=axis).reshape(512, 128)

        if j >= 128:
            rj = j // 128
            shp = (512 // (2 * rj), 2, rj, 128)
            Kq = swap2(K, 1, shp)
            Vq = swap2(V, 1, shp)
        else:
            shp = (512, 128 // (2 * j), 2, j)
            Kq = swap2(K, 2, shp)
            Vq = swap2(V, 2, shp)
        up = ((idx >> (k + 1)) & 1) == 0
        is_lo = (idx & j) == 0
        keep = jnp.where(
            up == is_lo,
            jnp.minimum(K, Kq) == K,
            jnp.maximum(K, Kq) == K,
        )
        # tie-break via vals for stability-ish behavior (not required)
        keys[...] = jnp.where(keep, K, Kq)
        vals[...] = jnp.where(keep, V, Vq)

    # One full merge pass (16 stages) — the complete 136-stage network
    # crashes this environment's remote compiler; per-stage cost
    # extrapolates (network = 136 stages).
    for jj in range(15, -1, -1):
        stage(15, 1 << jj)
    out_ref[...] = keys[...]


def bitonic():
    rng = np.random.default_rng(5)
    x = rng.integers(-(2**31), 2**31 - 1, (512, 128), np.int64).astype(
        np.int32
    )

    @jax.jit
    def run(xd):
        return pl.pallas_call(
            _bitonic_kernel,
            out_shape=jax.ShapeDtypeStruct((512, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((512, 128), jnp.int32),
                pltpu.VMEM((512, 128), jnp.int32),
            ],
        )(xd)

    xd = jax.device_put(jnp.asarray(x))
    out = np.asarray(run(xd)).reshape(-1)
    ok = True  # single merge pass: not a full sort; timing only
    t = timeit(lambda: run(xd))

    @jax.jit
    def xla_sort(xd):
        f = xd.reshape(-1)
        return jax.lax.sort(
            (f, jnp.arange(65536, dtype=jnp.int32)), num_keys=1
        )[0].reshape(512, 128)

    xs = np.asarray(xla_sort(xd)).reshape(-1)
    ok_x = bool((xs == np.sort(x.reshape(-1))).all())
    t_x = timeit(lambda: xla_sort(xd))
    print(
        f"bitonic 64K merge pass (16 of 136 stages): {t*1e6:.0f} us; "
        f"XLA lax.sort (key+val): {'OK' if ok_x else 'BAD'} {t_x*1e6:.0f} us",
        flush=True,
    )

if __name__ == "__main__":
    main()
