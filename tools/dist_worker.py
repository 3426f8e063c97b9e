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
    out = pathlib.Path(outdir)
    (out / f"payload_{pid}.bin").write_bytes(payload)
    (out / f"meta_{pid}.json").write_text(
        json.dumps(
            {
                "uncompressed_length": meta["uncompressed_length"],
                "block_lengths": [int(x) for x in meta["block_lengths"]],
                "block_offsets": [int(x) for x in meta["block_offsets"]],
                "local_blocks": meta["local_blocks"],
                "process_count": jax.process_count(),
                "local_device_count": jax.local_device_count(),
            }
        )
    )
    print(f"worker {pid} ok", flush=True)


if __name__ == "__main__":
    main()
