"""Device micro-benchmarks mirroring the reference's hot-path micros
(Snappier.Benchmarks: FindMatchLength, IncrementalCopy,
UnalignedCopy64/128, GetHashTable — SURVEY.md §6).

On the TPU the hot-path primitives live inside the fused scalar-core
kernels, so each micro is the production kernel driven by an input
class that isolates one primitive:

  FindMatchLength analog   encode of `abab...` blocks: one probe hit
                           then a maximal stride-4 XOR extension per
                           fragment — extension-dominated.
  GetHashTable analog      encode of incompressible random blocks:
                           every position is a hash probe + table
                           update with no matches — probe-dominated.
  IncrementalCopy analog   decode of run data (`aaaa...`): offset-1
                           copies through the pattern-expansion path
                           (CopyHelpers.IncrementalCopy semantics).
  UnalignedCopy analog     decode of incompressible blocks: maximal
                           literals streamed through the word funnel
                           (UnalignedCopy64/128 semantics).
  CharTable walk analog    decode of html: the mixed-tag dispatch walk.

Run on the real chip: python benchmarks/micros_tpu.py
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    import jax

    cache = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache_tpu"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from snappier_tpu.constants import BLOCK_SIZE
    from snappier_tpu.format import oracle
    from snappier_tpu.ops.pallas.scalar_codec import (
        decode_blocks_scalar,
        encode_blocks_scalar,
    )

    B = 128
    rng = np.random.default_rng(9)
    html = (DATA / "html").read_bytes() if (DATA / "html").exists() else bytes(
        rng.integers(32, 127, 100_000, np.uint8)
    )

    def blocks_of(pattern: bytes) -> np.ndarray:
        reps = -(-B * BLOCK_SIZE // len(pattern))
        tiled = (pattern * reps)[: B * BLOCK_SIZE]
        return np.frombuffer(tiled, np.uint8).reshape(B, BLOCK_SIZE).astype(
            np.int32
        )

    lengths = jnp.asarray(np.full(B, BLOCK_SIZE, np.int32))

    def timeit(fn, iters=3, passes=3):
        leaves = jax.tree.leaves(fn())
        np.asarray(min(leaves, key=lambda x: x.size))
        best = float("inf")
        for _ in range(passes):
            t0 = time.perf_counter()
            for _ in range(iters):
                r = fn()
            np.asarray(min(jax.tree.leaves(r), key=lambda x: x.size))
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    rows = []

    def enc_micro(name, data_blocks):
        d = jax.device_put(jnp.asarray(data_blocks))
        fn = lambda: encode_blocks_scalar(d, lengths, interpret=False)
        t = timeit(fn)
        rows.append((name, B * BLOCK_SIZE / t / 1e6))

    def dec_micro(name, plain_pattern):
        comp = bytes(oracle.compress(np.frombuffer(
            (plain_pattern * (-(-BLOCK_SIZE // len(plain_pattern))))[
                :BLOCK_SIZE
            ], np.uint8,
        )))
        cap = -(-len(comp) // 1024) * 1024
        arr = np.zeros((B, cap), np.int32)
        arr[:, : len(comp)] = np.frombuffer(comp, np.uint8)
        d = jax.device_put(jnp.asarray(arr))
        lens = jnp.asarray(np.full(B, len(comp), np.int32))
        fn = lambda: decode_blocks_scalar(
            d, lens, out_cap=BLOCK_SIZE, interpret=False
        )
        outs, out_lens, errs = fn()
        assert int(np.asarray(errs).max()) == 0, name
        t = timeit(fn)
        rows.append((name, B * BLOCK_SIZE / t / 1e6))

    rand_block = bytes(rng.integers(0, 256, BLOCK_SIZE, np.uint8))
    enc_micro("FindMatchLength analog (encode abab run)", blocks_of(b"ab"))
    enc_micro("GetHashTable analog (encode random, all misses)",
              blocks_of(rand_block))
    dec_micro("IncrementalCopy analog (decode offset-1 runs)", b"a")
    dec_micro("UnalignedCopy analog (decode max literals)", rand_block)
    dec_micro("CharTable walk analog (decode html)", html)

    width = max(len(r[0]) for r in rows)
    print(f"| {'micro (128 x 64 KiB blocks, device-resident)':<{width}} |"
          f" {'MB/s':>8} |")
    print(f"|{'-' * (width + 2)}|{'-' * 10}|")
    for name, rate in rows:
        print(f"| {name:<{width}} | {rate:8.1f} |")


DATA = pathlib.Path("/root/reference/Snappier.Tests/TestData")

if __name__ == "__main__":
    main()
