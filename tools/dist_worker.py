"""Worker process for the two-process jax.distributed test.

Joins a localhost coordinator, compresses a deterministic corpus
data-parallel over the global (2-process) CPU mesh, and writes its
partial payload + assembly map for the parent test to combine.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=4 \
  python tools/dist_worker.py <coordinator> <num_procs> <pid> <outdir>
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def corpus(n_blocks: int) -> bytes:
    from snappier_tpu.constants import BLOCK_SIZE

    rng = np.random.default_rng(1234)
    target = n_blocks * BLOCK_SIZE - 777
    unit = b"distributed ordered assembly over localhost "
    text = (unit * (target // len(unit) + 1))[:target]
    arr = np.frombuffer(text, np.uint8).copy()
    noise = rng.integers(0, 256, len(arr) // 7, dtype=np.uint8)
    arr[: len(noise)] = noise
    return arr.tobytes()


def stream_case(n_frags: int, frag: int = 2048) -> tuple[bytes, bytes]:
    """Deterministic variable-length block stream whose copy offsets
    stay within ``frag``-sized output lines (each chunk compressed
    standalone, bodies concatenated under one global preamble), plus
    its plaintext. Every process builds the identical pair."""
    from snappier_tpu.format import oracle
    from snappier_tpu.format.varint import read_varint, write_varint

    rng = np.random.default_rng(4321)
    chunks = []
    for i in range(n_frags):
        text = (f"distributed decode fragment {i:05d} ".encode() * 80)[:frag]
        arr = np.frombuffer(text, np.uint8).copy()
        arr[:48] = rng.integers(0, 256, 48)
        chunks.append(arr.tobytes())
    chunks[-1] = chunks[-1][: frag // 4]  # ragged tail
    data = b"".join(chunks)
    parts = [write_varint(len(data))]
    for c in chunks:
        body = oracle.compress(np.frombuffer(c, np.uint8))
        _, off = read_varint(np.frombuffer(body, np.uint8))
        parts.append(body[off:])
    return data, b"".join(parts)


def main() -> None:
    coordinator, num, pid, outdir = sys.argv[1:5]
    n_blocks = int(sys.argv[5]) if len(sys.argv) > 5 else 8
    import jax

    jax.config.update("jax_platforms", "cpu")
    from snappier_tpu.parallel import distributed

    distributed.initialize(
        coordinator_address=coordinator,
        num_processes=int(num),
        process_id=int(pid),
    )
    assert jax.process_count() == int(num)
    data = corpus(n_blocks)
    payload, meta = distributed.compress_corpus_sharded(data)
    # Decode twin: sharded decompress of a variable-length stream every
    # process holds in full; each writes only its addressable
    # fragments' bytes (plus the replicated assembly map).
    sdata, scomp = stream_case(3 * int(num) + 2)
    plain, dmeta = distributed.decompress_corpus_sharded(
        scomp, fragment_size=2048
    )
    assert len(plain) == len(sdata)
    out = pathlib.Path(outdir)
    (out / f"payload_{pid}.bin").write_bytes(payload)
    (out / f"plain_{pid}.bin").write_bytes(plain)
    (out / f"meta_{pid}.json").write_text(
        json.dumps(
            {
                "uncompressed_length": meta["uncompressed_length"],
                "block_lengths": [int(x) for x in meta["block_lengths"]],
                "block_offsets": [int(x) for x in meta["block_offsets"]],
                "local_blocks": meta["local_blocks"],
                "fragment_lengths": [
                    int(x) for x in dmeta["fragment_lengths"]
                ],
                "fragment_offsets": [
                    int(x) for x in dmeta["fragment_offsets"]
                ],
                "local_fragments": dmeta["local_fragments"],
                "process_count": jax.process_count(),
                "local_device_count": jax.local_device_count(),
            }
        )
    )
    print(f"worker {pid} ok", flush=True)


if __name__ == "__main__":
    main()
