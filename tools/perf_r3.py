"""Round-3 kernel timing harness (run on the real TPU chip).

Times the PRODUCTION scalar kernels (ops/pallas/scalar_codec.py) on
B x 64 KiB html blocks and prints decode ns/tag + both throughputs.
Used as the A/B meter for the round-3 trim campaign: edit the kernel,
re-run, keep or revert (methodology: bench.py host-fetch barrier,
best-of-N passes; see docs/ROADMAP.md ablation log).

Usage: python tools/perf_r3.py [B]
"""

from __future__ import annotations

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache_tpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from snappier_tpu.constants import BLOCK_SIZE
from snappier_tpu.format import oracle
from snappier_tpu.ops.pallas.scalar_codec import (
    decode_blocks_scalar,
    encode_blocks_scalar,
)


def timeit(fn, iters=5, passes=3):
    np.asarray(jax.tree.leaves(fn())[1])  # warm / compile
    best = float("inf")
    for _ in range(passes):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn()
        np.asarray(jax.tree.leaves(r)[1])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def count_tags(comp: bytes) -> int:
    from snappier_tpu.format.varint import read_varint

    buf = np.frombuffer(comp, np.uint8)
    _, ip = read_varint(buf)
    tags = 0
    while ip < len(buf):
        t = int(buf[ip])
        tt = t & 3
        if tt == 0:
            l6 = t >> 2
            if l6 < 60:
                hdr, length = 1, l6 + 1
            else:
                e = l6 - 59
                length = int.from_bytes(bytes(buf[ip + 1 : ip + 1 + e]),
                                        "little") + 1
                hdr = 1 + e
            ip += hdr + length
        else:
            ip += {1: 2, 2: 3, 3: 5}[tt]
        tags += 1
    return tags


def main() -> None:
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    html = pathlib.Path(
        "/root/reference/Snappier.Tests/TestData/html"
    ).read_bytes()
    reps = -(-B * BLOCK_SIZE // len(html))
    tiled = (html * reps)[: B * BLOCK_SIZE]
    frags = np.frombuffer(tiled, np.uint8).reshape(B, BLOCK_SIZE)

    frags_d = jax.device_put(jnp.asarray(frags.astype(np.int32)))
    lens_d = jax.device_put(jnp.asarray(np.full(B, BLOCK_SIZE, np.int32)))

    # --- encode -----------------------------------------------------------
    bodies, blens = encode_blocks_scalar(frags_d, lens_d)
    bodies_h = np.asarray(bodies)
    blens_h = np.asarray(blens)
    t_e = timeit(lambda: encode_blocks_scalar(frags_d, lens_d))
    enc_us_blk = t_e / B * 1e6
    enc_mbs = B * BLOCK_SIZE / t_e / 1e6

    # --- decode (input = this encoder's own output) ------------------------
    pre = np.array([0x80 | (BLOCK_SIZE & 0x7F),
                    0x80 | ((BLOCK_SIZE >> 7) & 0x7F),
                    (BLOCK_SIZE >> 14) & 0x7F], np.uint8)
    comps = [pre.tobytes() + bodies_h[i, : blens_h[i]].astype(np.uint8)
             .tobytes() for i in range(B)]
    cc = max(len(c) for c in comps)
    cc = -(-cc // 1024) * 1024
    comp = np.zeros((B, cc), np.int32)
    clens = np.zeros(B, np.int32)
    for i, c in enumerate(comps):
        a = np.frombuffer(c, np.uint8)
        comp[i, : len(a)] = a
        clens[i] = len(a)
    comp_d = jax.device_put(jnp.asarray(comp))
    clens_d = jax.device_put(jnp.asarray(clens))

    outs, olens, errs = decode_blocks_scalar(comp_d, clens_d,
                                             out_cap=BLOCK_SIZE)
    assert int(np.asarray(errs).max()) == 0
    assert (np.asarray(outs[0])[:BLOCK_SIZE] == frags[0]).all(), "roundtrip"
    t_d = timeit(lambda: decode_blocks_scalar(comp_d, clens_d,
                                              out_cap=BLOCK_SIZE))
    dec_mbs = B * BLOCK_SIZE / t_d / 1e6

    ntags = count_tags(comps[0])
    ns_tag = t_d / B / ntags * 1e9
    ratio = sum(len(c) - 3 for c in comps) / (B * BLOCK_SIZE)
    comb = 2 * B * BLOCK_SIZE / (t_e + t_d) / 1e9
    print(
        f"B={B} enc {enc_us_blk:7.1f} us/blk {enc_mbs:6.1f} MB/s | "
        f"dec {t_d / B * 1e6:6.1f} us/blk {dec_mbs:6.1f} MB/s "
        f"{ns_tag:6.1f} ns/tag ({ntags} tags) | ratio {ratio:.4f} | "
        f"combined {comb:.4f} GB/s"
    )


if __name__ == "__main__":
    main()
