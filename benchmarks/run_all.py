"""Benchmark suite mirroring the reference's harness categories
(Snappier.Benchmarks/, SURVEY.md §6): block compress/decompress of a
64 KiB html fragment, framed stream round trips, full-corpus sweeps,
and micro-benchmarks (CRC32C, varint).

Usage:
    python benchmarks/run_all.py [--engine native|tpu|oracle] [--quick]
        [--fuzz]

``--fuzz`` appends the reference-scale randomized campaigns
(tools/fuzz_host.py: 20,000 native + 2,000 scan-kernel iterations in
the SnappyTests.cs:401-446 generator shape) — the recurring-check
wiring for the fuzz suite. Kernel-level micro-benchmarks
(FindMatchLength/GetHashTable/IncrementalCopy/UnalignedCopy analogs)
live in benchmarks/micros_tpu.py (plus the ablation probes in
tools/perf_probe*.py) and run on the real chip.

Prints a markdown table; unlike bench.py (the driver's one-line JSON
contract) this is the human-facing harness.
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

DATA = pathlib.Path("/root/reference/Snappier.Tests/TestData")
CORPUS = [
    "alice29.txt", "asyoulik.txt", "fireworks.jpeg", "geo.protodata",
    "html", "html_x_4", "kppkn.gtb", "lcet10.txt", "paper-100k.pdf",
    "plrabn12.txt", "urls.10K",
]


def _load(name: str) -> bytes:
    p = DATA / name
    if p.exists():
        return p.read_bytes()
    rng = np.random.default_rng(abs(hash(name)) % 2**32)
    return rng.integers(32, 127, 100_000, np.uint8).tobytes()


def timeit(fn, *, min_time=0.3, max_iters=200):
    fn()  # warm
    iters = 0
    t0 = time.perf_counter()
    while True:
        fn()
        iters += 1
        dt = time.perf_counter() - t0
        if dt >= min_time or iters >= max_iters:
            return dt / iters


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--engine", default="auto")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--fuzz", action="store_true")
    args = ap.parse_args()
    eng = args.engine

    import snappier_tpu as st
    from snappier_tpu.format.crc32c import crc32c
    from snappier_tpu.format.varint import read_varint, write_varint
    from snappier_tpu.runtime import native

    rows = []

    def add(name, nbytes, secs, extra=""):
        rows.append((name, f"{nbytes / secs / 1e6:8.1f} MB/s", extra))

    html64 = _load("html")[: 64 * 1024]
    comp64 = st.compress(html64, engine=eng)
    add("BlockCompress64KbHtml", len(html64),
        timeit(lambda: st.compress(html64, engine=eng)),
        f"ratio {len(comp64)/len(html64):.3f}")
    add("BlockDecompress64KbHtml", len(html64),
        timeit(lambda: st.decompress(comp64, engine=eng)))

    html = _load("html")
    framed = st.stream_compress(html, engine=eng)
    add("StreamCompressHtml", len(html),
        timeit(lambda: st.stream_compress(html, engine=eng)))
    add("StreamDecompressHtml", len(framed),
        timeit(lambda: st.stream_decompress(framed, engine=eng)))

    if not args.quick:
        total_in = 0
        comp_all = []
        for name in CORPUS:
            data = _load(name)
            total_in += len(data)
            comp_all.append((name, st.stream_compress(data, engine=eng)))
        t = timeit(
            lambda: [st.stream_compress(_load(n), engine=eng) for n in CORPUS],
            min_time=0.5, max_iters=20,
        )
        add("CompressAll (11 files)", total_in, t,
            f"ratio {sum(len(c) for _, c in comp_all)/total_in:.3f}")
        t = timeit(
            lambda: [st.stream_decompress(c, engine=eng) for _, c in comp_all],
            min_time=0.5, max_iters=20,
        )
        add("DecompressAll (11 files)", total_in, t)

        # level="best" throughput (round-5 verdict item 8: density was
        # pinned corpus-wide by tests/test_best_level.py, speed was not
        # published anywhere user-visible). Device engine only.
        try:
            bcomp = st.compress(html64, engine="tpu", level="best")
            t = timeit(
                lambda: st.compress(html64, engine="tpu", level="best"),
                min_time=0.5,
                max_iters=20,
            )
            add(
                "BlockCompress64KbHtml level=best",
                len(html64),
                t,
                f"ratio {len(bcomp)/len(html64):.3f}",
            )
        except Exception as e:  # no device / interpret-only env
            rows.append(
                ("BlockCompress64KbHtml level=best", "n/a", str(e)[:40])
            )

    blob = np.random.default_rng(0).integers(0, 256, 65536, np.uint8).tobytes()
    add("Crc32C 64KiB (GF2 host)", len(blob), timeit(lambda: crc32c(blob)))
    if native.available():
        add("Crc32C 64KiB (native)", len(blob),
            timeit(lambda: native.crc32c(blob)))
    v = 0xDEADBEEF
    enc = write_varint(v)
    n_iter = 10000
    t = timeit(lambda: [write_varint(v) for _ in range(n_iter)])
    rows.append(("VarIntWrite", f"{t/n_iter*1e9:8.0f} ns/op", ""))
    t = timeit(lambda: [read_varint(enc) for _ in range(n_iter)])
    rows.append(("VarIntRead", f"{t/n_iter*1e9:8.0f} ns/op", ""))

    width = max(len(r[0]) for r in rows)
    print(f"| {'benchmark':<{width}} | {'rate':>14} | notes |")
    print(f"|{'-'*(width+2)}|{'-'*16}|-------|")
    for name, rate, extra in rows:
        print(f"| {name:<{width}} | {rate:>14} | {extra} |")

    if args.fuzz:
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "fuzz_host",
            pathlib.Path(__file__).resolve().parent.parent
            / "tools"
            / "fuzz_host.py",
        )
        fuzz_host = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(fuzz_host)
        fuzz_host.run_native(20000, 301)
        fuzz_host.run_stream(2000, 301)
        fuzz_host.run_scan(2000, 301)


if __name__ == "__main__":
    main()
