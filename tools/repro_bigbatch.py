"""Isolate the 100 MB config3 CRC failure: exercise the device block
codec at B=2048 (the batch size _pow2_batch picks for a 100 MB stream)
and verify each side against the host native engine.

Usage: python tools/repro_bigbatch.py [enc|dec|crc ...] [B]
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def _setup():
    import jax

    cache = pathlib.Path(__file__).parent.parent / ".jax_cache_tpu"
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def _chunks(B: int) -> list[bytes]:
    html = pathlib.Path(
        "/root/reference/Snappier.Tests/TestData/html"
    ).read_bytes()
    data = (html * (B * 65536 // len(html) + 1))[: B * 65536]
    return [data[i : i + 65536] for i in range(0, len(data), 65536)]


def enc(B: int) -> None:
    _setup()
    from snappier_tpu.constants import BLOCK_SIZE
    from snappier_tpu.format.varint import write_varint
    from snappier_tpu.runtime import block as block_rt
    from snappier_tpu.runtime import native

    chunks = _chunks(B)
    frags = np.zeros((B, BLOCK_SIZE), np.uint8)
    lengths = np.zeros(B, np.int32)
    for i, c in enumerate(chunks):
        frags[i] = np.frombuffer(c, np.uint8)
        lengths[i] = len(c)
    bodies, body_lens = block_rt.compress_fragments(frags, lengths)
    bodies = np.asarray(bodies)
    body_lens = np.asarray(body_lens)
    bad = []
    for i, c in enumerate(chunks):
        comp = write_varint(len(c)) + bodies[i, : int(body_lens[i])].tobytes()
        try:
            out = native.decompress(comp)
        except Exception as e:  # noqa: BLE001
            bad.append((i, f"decode error {e}"))
            continue
        if out != c:
            k = next(j for j in range(len(c)) if out[j : j + 1] != c[j : j + 1])
            bad.append((i, f"mismatch at byte {k} of {len(out)}"))
    print(f"enc B={B}: {len(bad)} bad rows", bad[:5], flush=True)


def dec(B: int) -> None:
    _setup()
    from snappier_tpu.runtime import block as block_rt
    from snappier_tpu.runtime import native
    from snappier_tpu.runtime.stream import CHUNK_COMP_CAP

    chunks = _chunks(B)
    comp = np.zeros((B, CHUNK_COMP_CAP), np.uint8)
    comp_lens = np.zeros(B, np.int32)
    for i, c in enumerate(chunks):
        p = native.compress(c)
        comp[i, : len(p)] = np.frombuffer(p, np.uint8)
        comp_lens[i] = len(p)
    outs, out_lens, errs = block_rt.decompress_blocks(
        comp, comp_lens, out_cap=65536
    )
    outs = np.asarray(outs)
    out_lens = np.asarray(out_lens)
    errs = np.asarray(errs)
    bad = []
    for i, c in enumerate(chunks):
        if errs[i] != 0:
            bad.append((i, f"err={errs[i]}"))
            continue
        out = outs[i, : int(out_lens[i])].tobytes()
        if out != c:
            k = next(j for j in range(len(c)) if out[j : j + 1] != c[j : j + 1])
            bad.append((i, f"mismatch at byte {k} of {len(out)}"))
    print(f"dec B={B}: {len(bad)} bad rows", bad[:5], flush=True)


def crc(B: int) -> None:
    jax = _setup()
    from snappier_tpu.format.crc32c import crc32c
    from snappier_tpu.ops.pallas.crc32c import crc32c_blocks
    import jax.numpy as jnp

    chunks = _chunks(B)
    arr = np.zeros((B, 65536), np.int32)
    lens = np.zeros(B, np.int32)
    for i, c in enumerate(chunks):
        arr[i] = np.frombuffer(c, np.uint8)
        lens[i] = len(c)
    dev = np.asarray(
        crc32c_blocks(jnp.asarray(arr), jnp.asarray(lens))
    ).view(np.uint32)
    bad = [
        (i, hex(int(dev[i])), hex(crc32c(c)))
        for i, c in enumerate(chunks)
        if int(dev[i]) != crc32c(c)
    ]
    print(f"crc B={B}: {len(bad)} bad rows", bad[:5], flush=True)


def main() -> None:
    args = sys.argv[1:]
    B = int(args[-1]) if args and args[-1].isdigit() else 2048
    which = [a for a in args if not a.isdigit()] or ["enc", "dec", "crc"]
    for w in which:
        {"enc": enc, "dec": dec, "crc": crc}[w](B)


if __name__ == "__main__":
    main()
