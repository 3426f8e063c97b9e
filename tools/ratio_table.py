"""Compressed-size table: every engine over the 11-file canonical
corpus, against the reference's golden anchors where they exist
(alice29.snappy, html_x_4.snappy — BASELINE.md "verifiable baselines").

Usage: python tools/ratio_table.py [--no-tpu]
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

DATA = pathlib.Path("/root/reference/Snappier.Tests/TestData")
CORPUS = [
    "alice29.txt", "asyoulik.txt", "fireworks.jpeg", "geo.protodata",
    "html", "html_x_4", "kppkn.gtb", "lcet10.txt", "paper-100k.pdf",
    "plrabn12.txt", "urls.10K",
]
GOLDEN = {"alice29.txt": "alice29.snappy", "html_x_4": "html_x_4.snappy"}


def _kernel_sizes(files: dict[str, bytes]) -> dict[str, dict[str, int]]:
    """Per-file scalar-fast and best sizes via ONE batched kernel call
    each (per-file batch shapes would each recompile, ~90 s a shape)."""
    import jax.numpy as jnp
    import numpy as np

    from snappier_tpu.constants import BLOCK_SIZE
    from snappier_tpu.format.varint import write_varint
    from snappier_tpu.ops.pallas.scalar_codec import (
        encode_blocks_best,
        encode_blocks_scalar,
    )

    spans, rows, lens = {}, [], []
    for name, data in files.items():
        arr = np.frombuffer(data, np.uint8)
        nfrags = max(1, -(-len(arr) // BLOCK_SIZE))
        spans[name] = (len(lens), nfrags, len(write_varint(len(arr))))
        for i in range(nfrags):
            frag = arr[i * BLOCK_SIZE : (i + 1) * BLOCK_SIZE]
            row = np.zeros(BLOCK_SIZE, np.int32)
            row[: len(frag)] = frag
            rows.append(row)
            lens.append(len(frag))
    fd = jnp.asarray(np.stack(rows))
    ld = jnp.asarray(np.asarray(lens, np.int32))
    _, fast_lens = encode_blocks_scalar(fd, ld)
    _, best_lens = encode_blocks_best(fd, ld)
    fast_lens, best_lens = np.asarray(fast_lens), np.asarray(best_lens)
    return {
        name: {
            "scalar": int(fast_lens[a : a + k].sum()) + pre,
            "best": int(best_lens[a : a + k].sum()) + pre,
        }
        for name, (a, k, pre) in spans.items()
    }


def main() -> None:
    with_tpu = "--no-tpu" not in sys.argv
    if with_tpu:
        import jax

        cache = pathlib.Path(__file__).parent.parent / ".jax_cache_tpu"
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from snappier_tpu.format import oracle
    from snappier_tpu.runtime import native

    files = {n: (DATA / n).read_bytes() for n in CORPUS if (DATA / n).exists()}
    kernel = _kernel_sizes(files) if with_tpu else {}

    rows = []
    for name, data in files.items():
        entry = {"file": name, "n": len(data)}
        entry["oracle"] = len(oracle.compress(data))
        if native.available():
            entry["native"] = len(native.compress(data))
        entry.update(kernel.get(name, {}))
        g = GOLDEN.get(name)
        if g and (DATA / g).exists():
            entry["reference"] = len((DATA / g).read_bytes())
        rows.append(entry)
        print(entry, flush=True)

    cols = ["file", "n", "reference", "oracle", "native", "scalar", "best"]
    print()
    print("| " + " | ".join(cols) + " |")
    print("|" + "---|" * len(cols))
    for e in rows:
        print("| " + " | ".join(str(e.get(c, "-")) for c in cols) + " |")


if __name__ == "__main__":
    main()
