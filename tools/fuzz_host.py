"""Reference-scale host fuzz campaign (SnappyTests.cs:401-446 shape).

The reference runs 20,000 seeded iterations of skewed run-length data,
with the first 100 sized 64-128 KiB so copies cross the 64 KiB fragment
boundary. This tool reproduces that volume against the repo's engines:

* campaign ``native`` (default 20,000 iters): C++ host engine
  round-trip, with an oracle cross-check on every 100th iteration.
* campaign ``scan``   (default 2,000 iters): the portable JAX kernels
  through the public block API (``engine="tpu"`` on the CPU backend),
  exercising prescan, bucketing, batching, and both kernel directions;
  every 20th iteration is also cross-decoded by the native engine.

Exit code 0 = every iteration exact. Wired into benchmarks/run_all.py;
results are recorded in docs/ROADMAP.md.

A fourth campaign, ``device-stream``, drives the framed DEVICE path
end to end (SnappyWriter(engine='tpu') with flush-heavy writes and
skippable/padding injection) — reference shape SnappyStreamTests.cs
:145-262.

Usage: python tools/fuzz_host.py [native_iters] [scan_iters] [seed]
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def gen_block(rng: np.random.Generator, size: int) -> bytes:
    """Skewed run-length data: alternating constant runs and noise runs
    with geometric lengths — the shape that stresses both the match
    finder (long runs -> long overlapping copies) and literal paths."""
    out = np.empty(size, np.uint8)
    pos = 0
    while pos < size:
        run = min(int(rng.geometric(0.05)), size - pos)
        if rng.random() < 0.5:
            out[pos : pos + run] = rng.integers(0, 256)
        else:
            out[pos : pos + run] = rng.integers(0, 256, run, dtype=np.uint8)
        pos += run
    return out.tobytes()


def size_for(rng: np.random.Generator, i: int) -> int:
    if i < 100:
        return int(rng.integers(65536, 131073))
    return int(rng.integers(0, 8192))


def run_native(iters: int, seed: int) -> None:
    from snappier_tpu.format import oracle
    from snappier_tpu.runtime import native

    if not native.available():
        print("native engine unavailable — skipping native campaign")
        return
    rng = np.random.default_rng(seed)
    t0 = time.time()
    nbytes = 0
    for i in range(iters):
        data = gen_block(rng, size_for(rng, i))
        nbytes += len(data)
        comp = native.compress(data)
        assert native.decompress(comp) == data, f"native roundtrip @ {i}"
        if i % 100 == 0:
            assert oracle.decompress(comp) == data, f"oracle cross @ {i}"
    dt = time.time() - t0
    print(
        f"native campaign: {iters} iters, {nbytes/1e6:.1f} MB, "
        f"{dt:.1f}s — all exact"
    )


def run_scan(iters: int, seed: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    cache = pathlib.Path(__file__).parent.parent / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from snappier_tpu.runtime import block, native

    rng = np.random.default_rng(seed + 1)
    t0 = time.time()
    nbytes = 0
    for i in range(iters):
        data = gen_block(rng, size_for(rng, i))
        nbytes += len(data)
        comp = block.compress(data, engine="tpu")
        assert block.decompress(comp, engine="tpu") == data, f"scan rt @ {i}"
        if i % 20 == 0 and native.available():
            assert native.decompress(comp) == data, f"native cross @ {i}"
            assert (
                block.decompress(native.compress(data), engine="tpu") == data
            ), f"scan decode of native stream @ {i}"
    dt = time.time() - t0
    print(
        f"scan campaign: {iters} iters, {nbytes/1e6:.1f} MB, "
        f"{dt:.1f}s — all exact"
    )


def run_stream(iters: int, seed: int) -> None:
    """Differential fuzz of the C++ framing pipeline against the Python
    chunk state machine: round trips both ways, plus mutated framed
    streams where both sides must agree on accept/reject (and on bytes
    when both accept)."""
    from snappier_tpu.errors import InvalidDataError
    from snappier_tpu.runtime import native
    from snappier_tpu.runtime import stream as pstream

    if not native.available():
        print("native engine unavailable — skipping stream campaign")
        return
    rng = np.random.default_rng(seed)
    t0 = time.time()
    nbytes = 0
    for i in range(iters):
        data = gen_block(rng, size_for(rng, i))
        nbytes += len(data)
        nf = native.stream_compress(data)
        assert native.stream_decompress(nf) == data, f"native stream @ {i}"
        pf = pstream.stream_compress(data, engine="oracle")
        assert native.stream_decompress(pf) == data, f"py->native @ {i}"
        if i % 20 == 0:
            assert pstream.stream_decompress(nf, engine="oracle") == data, (
                f"native->py @ {i}"
            )
        # Mutated stream: both sides must agree.
        mut = bytearray(nf)
        kind = int(rng.integers(0, 3))
        if kind == 0 and mut:
            for _ in range(int(rng.integers(1, 6))):
                mut[int(rng.integers(0, len(mut)))] ^= 1 << int(
                    rng.integers(0, 8)
                )
        elif kind == 1:
            mut = mut[: int(rng.integers(0, len(mut) + 1))]
        else:
            mut = bytearray(
                rng.integers(0, 256, int(rng.integers(0, 400)), np.uint8)
            )
        mb = bytes(mut)
        try:
            nout = native.stream_decompress(mb)
            n_ok = True
        except InvalidDataError:
            n_ok = False
        try:
            pout = pstream.stream_decompress(mb, engine="oracle")
            p_ok = True
        except InvalidDataError:
            p_ok = False
        assert n_ok == p_ok, f"verdict mismatch @ {i}: {n_ok} vs {p_ok}"
        if n_ok:
            assert nout == pout, f"accepted-bytes mismatch @ {i}"
    dt = time.time() - t0
    print(
        f"stream campaign: {iters} iters, {nbytes/1e6:.1f} MB, "
        f"{dt:.1f}s — all exact"
    )


def run_stream_device(iters: int, seed: int) -> None:
    """Framed-stream fuzz of the DEVICE pipeline (frame_batch_packed,
    pipelined sub-batches, batched decode, device CRC when a real TPU
    is attached — the same jitted graphs run in interpreter mode on
    CPU): flush-heavy multi-part writes through SnappyWriter
    (engine='tpu'), skippable/padding chunk injection, decode via
    stream_decompress(engine='tpu'), oracle cross-checks."""
    import io

    from snappier_tpu.runtime import stream as pstream

    rng = np.random.default_rng(seed + 7)
    t0 = time.time()
    nbytes = 0
    for i in range(iters):
        nparts = int(rng.integers(1, 6))
        parts = [
            gen_block(rng, int(rng.integers(1, 65537)))
            for _ in range(nparts)
        ]
        data = b"".join(parts)
        nbytes += len(data)
        sink = io.BytesIO()
        w = pstream.SnappyWriter(sink, engine="tpu", leave_open=True)
        for p in parts:
            w.write(p)
            if rng.random() < 0.5:
                w.flush()
        w.close()
        framed = sink.getvalue()
        if rng.random() < 0.5:
            # Legal skippable + padding chunks after the stream header.
            pad = bytes([0xFE]) + (3).to_bytes(3, "little") + b"xyz"
            skip = (
                bytes([int(rng.integers(0x80, 0xFE))])
                + (2).to_bytes(3, "little")
                + b"ab"
            )
            framed = framed[:10] + pad + skip + framed[10:]
        assert pstream.stream_decompress(framed, engine="tpu") == data, (
            f"device stream roundtrip @ {i}"
        )
        if i % 10 == 0:
            assert (
                pstream.stream_decompress(framed, engine="oracle") == data
            ), f"device->oracle @ {i}"
    dt = time.time() - t0
    print(
        f"device-stream campaign: {iters} iters, {nbytes/1e6:.1f} MB, "
        f"{dt:.1f}s — all exact"
    )


def run_scalar(rows: int, seed: int) -> None:
    """Randomized-fragment-size fuzz of the PRODUCTION Pallas scalar
    kernels (round-4 verdict item: the kernel family was fuzzed only
    through the oracle). Kernel shapes are static, so the ladder uses
    three fragment shapes F in {1, 8, 64} KiB while the *data length*
    — the thing the walk actually branches on — varies uniformly in
    [0, F] per row. Skewed run-length rows are encoded by
    encode_blocks_scalar, assembled into full blocks, decoded by
    decode_blocks_scalar, and byte-compared to the input; every 16th
    row is cross-decoded by the oracle and every 4th batch also runs
    the best-level encoder (same batch shape — the XLA:CPU re-dispatch
    bug needs a batch-size CHANGE to trigger, docs/ROADMAP.md).
    Interpret mode off-TPU; the identical programs compile on chip."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    cache = pathlib.Path(__file__).parent.parent / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from snappier_tpu.format import oracle
    from snappier_tpu.format.varint import write_varint
    from snappier_tpu.ops.pallas.scalar_codec import (
        decode_blocks_scalar,
        encode_blocks_best,
        encode_blocks_scalar,
    )

    B = 32
    shapes = (1024, 8192, 65536)
    rng = np.random.default_rng(seed + 13)
    t0 = time.time()
    nbytes = 0
    done = 0
    batch_i = 0
    while done < rows:
        F = shapes[batch_i % len(shapes)]
        lengths = rng.integers(0, F + 1, B).astype(np.int32)
        lengths[0] = F  # always exercise the full-fragment path
        frags = np.zeros((B, F), np.int32)
        datas = []
        for r in range(B):
            d = gen_block(rng, int(lengths[r])) if lengths[r] else b""
            datas.append(d)
            frags[r, : len(d)] = np.frombuffer(d, np.uint8)
            nbytes += len(d)
        fd, ld = jnp.asarray(frags), jnp.asarray(lengths)
        enc = [("scalar", *encode_blocks_scalar(fd, ld))]
        if batch_i % 4 == 0:
            enc.append(("best", *encode_blocks_best(fd, ld)))
        for kind, bodies, body_lens in enc:
            bodies = np.asarray(bodies, np.uint8)
            body_lens = np.asarray(body_lens)
            CC = F + 4096
            comp = np.zeros((B, CC), np.uint8)
            comp_lens = np.zeros(B, np.int32)
            blocks = []
            for r in range(B):
                blk = write_varint(int(lengths[r])) + bodies[
                    r, : int(body_lens[r])
                ].tobytes()
                blocks.append(blk)
                comp[r, : len(blk)] = np.frombuffer(blk, np.uint8)
                comp_lens[r] = len(blk)
            outs, out_lens, errs = decode_blocks_scalar(
                jnp.asarray(comp.astype(np.int32)),
                jnp.asarray(comp_lens),
                out_cap=F,
            )
            outs = np.asarray(outs, np.uint8)
            out_lens, errs = np.asarray(out_lens), np.asarray(errs)
            for r in range(B):
                tagmsg = f"{kind} F={F} batch={batch_i} row={r}"
                assert errs[r] == 0, f"decode error {errs[r]} @ {tagmsg}"
                assert out_lens[r] == lengths[r], f"out_len @ {tagmsg}"
                assert (
                    outs[r, : int(lengths[r])].tobytes() == datas[r]
                ), f"bytes @ {tagmsg}"
                if r % 16 == 0:
                    assert (
                        bytes(oracle.decompress(
                            np.frombuffer(blocks[r], np.uint8)
                        )) == datas[r]
                    ), f"oracle cross @ {tagmsg}"
        done += B
        batch_i += 1
    dt = time.time() - t0
    print(
        f"scalar-kernel campaign: {done} rows (+best on 1/4 batches), "
        f"{nbytes/1e6:.1f} MB, {dt:.1f}s — all exact"
    )


def main() -> None:
    native_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    scan_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 301
    run_native(native_iters, seed)
    run_stream(max(native_iters // 10, 100), seed)
    run_scan(scan_iters, seed)
    run_stream_device(max(scan_iters // 100, 20), seed)
    run_scalar(max(scan_iters // 8, 32), seed)


if __name__ == "__main__":
    main()
