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


def main() -> None:
    with_tpu = "--no-tpu" not in sys.argv
    if with_tpu:
        import jax

        cache = pathlib.Path(__file__).parent.parent / ".jax_cache_tpu"
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from snappier_tpu.format import oracle
    from snappier_tpu.runtime import block, native

    rows = []
    for name in CORPUS:
        p = DATA / name
        if not p.exists():
            continue
        data = p.read_bytes()
        entry = {"file": name, "n": len(data)}
        entry["oracle"] = len(oracle.compress(data))
        if native.available():
            entry["native"] = len(native.compress(data))
        if with_tpu:
            entry["scalar"] = len(block.compress(data, engine="tpu"))
            entry["best"] = len(block.compress(data, level="best"))
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
