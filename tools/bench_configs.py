"""BASELINE measurement configs 3 and 4 (BASELINE.md "Measurement
configs"): the 100 MB framed stream with CRC32C, and the 1024 x 64 KiB
block batch (the 8-chip config, run on however many chips are
attached — chip count is reported).

Config 3 is end-to-end host-bytes -> host-bytes through the public
stream API (includes host framing, device batching, device decode CRC,
and the host<->device transfers — on this environment those ride a
~130 MB/s HTTP tunnel, which a production PCIe host does not have; the
number is honest for this box and a lower bound elsewhere).

Config 4 is device-resident compute (the bench.py methodology: host
fetch of a scalar leaf as the completion barrier, best-of-N).

Usage: python tools/bench_configs.py [config3|config4 ...]
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def _setup_jax():
    import jax

    cache = pathlib.Path(__file__).parent.parent / ".jax_cache_tpu"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def _html() -> bytes:
    return pathlib.Path(
        "/root/reference/Snappier.Tests/TestData/html"
    ).read_bytes()


def config3(size_mb: int = 100) -> None:
    jax = _setup_jax()
    import snappier_tpu as st

    data = (_html() * (size_mb * 1_000_000 // len(_html()) + 1))[
        : size_mb * 1_000_000
    ]
    # Warm compiles.
    comp = st.stream_compress(data[: 8 << 20], engine="tpu")
    st.stream_decompress(comp, engine="tpu")

    best_c = best_d = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        framed = st.stream_compress(data, engine="tpu")
        best_c = min(best_c, time.perf_counter() - t0)
    for _ in range(2):
        t0 = time.perf_counter()
        out = st.stream_decompress(framed, engine="tpu")
        best_d = min(best_d, time.perf_counter() - t0)
    assert out == data, "100 MB stream roundtrip mismatch"
    print(
        json.dumps(
            {
                "config": "3: 100 MB framed stream + CRC32C (end-to-end host bytes)",
                "compress_MBps": round(len(data) / best_c / 1e6, 1),
                "decompress_MBps": round(len(data) / best_d / 1e6, 1),
                "ratio": round(len(framed) / len(data), 4),
                "device": str(jax.devices()[0]),
            }
        ),
        flush=True,
    )


def config4(B: int = 1024) -> None:
    jax = _setup_jax()
    import jax.numpy as jnp

    from snappier_tpu.constants import BLOCK_SIZE
    from snappier_tpu.models.codec import SnappyCodec

    html = _html()
    reps = -(-B * BLOCK_SIZE // len(html))
    tiled = (html * reps)[: B * BLOCK_SIZE]
    frags = np.frombuffer(tiled, np.uint8).reshape(B, BLOCK_SIZE).astype(
        np.int32
    )
    lengths = np.full(B, BLOCK_SIZE, np.int32)

    codec = SnappyCodec(with_crc=True)
    frags_d = jax.device_put(jnp.asarray(frags))
    lengths_d = jax.device_put(jnp.asarray(lengths))
    bodies, body_lens, _ = codec.compress_batch(frags_d, lengths_d)
    bodies.block_until_ready()

    pre = np.stack(
        [
            (lengths & 0x7F) | 0x80,
            ((lengths >> 7) & 0x7F) | 0x80,
            (lengths >> 14) & 0x7F,
        ],
        axis=1,
    ).astype(np.int32)
    blocks = np.concatenate([pre, np.asarray(bodies)], axis=1)
    pad = (-blocks.shape[1]) % 1024
    blocks = np.concatenate(
        [blocks, np.zeros((B, pad), blocks.dtype)], axis=1
    )
    blocks_d = jax.device_put(jnp.asarray(blocks))
    block_lens_d = jax.device_put(jnp.asarray(np.asarray(body_lens) + 3))
    outs, _, errs = codec.decompress_batch(
        blocks_d, block_lens_d, out_cap=BLOCK_SIZE
    )
    outs.block_until_ready()
    assert int(np.max(np.asarray(errs))) == 0

    def timeit(fn, iters=2, passes=3):
        np.asarray(jax.tree.leaves(fn())[1])
        best = float("inf")
        for _ in range(passes):
            t0 = time.perf_counter()
            for _ in range(iters):
                r = fn()
            np.asarray(jax.tree.leaves(r)[1])
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    t_c = timeit(lambda: codec.compress_batch(frags_d, lengths_d))
    t_d = timeit(
        lambda: codec.decompress_batch(
            blocks_d, block_lens_d, out_cap=BLOCK_SIZE
        )
    )
    gb = B * BLOCK_SIZE / 1e9
    print(
        json.dumps(
            {
                "config": "4: 1024 x 64 KiB block batch (device-resident)",
                "chips": jax.device_count(),
                "compress_GBps": round(gb / t_c, 4),
                "decompress_GBps": round(gb / t_d, 4),
                "combined_GBps": round(2 * gb / (t_c + t_d), 4),
                "device": str(jax.devices()[0]),
            }
        ),
        flush=True,
    )


def config3_native(size_mb: int = 100) -> None:
    from snappier_tpu.runtime import native

    if not native.available():
        print(json.dumps({"config": "3n", "skipped": "no native"}))
        return
    data = (_html() * (size_mb * 1_000_000 // len(_html()) + 1))[
        : size_mb * 1_000_000
    ]
    native.stream_decompress(native.stream_compress(data[: 8 << 20]))
    best_c = best_d = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        framed = native.stream_compress(data)
        best_c = min(best_c, time.perf_counter() - t0)
    for _ in range(2):
        t0 = time.perf_counter()
        out = native.stream_decompress(framed)
        best_d = min(best_d, time.perf_counter() - t0)
    assert out == data
    print(
        json.dumps(
            {
                "config": "3n: 100 MB framed stream, C++ host pipeline",
                "compress_MBps": round(len(data) / best_c / 1e6, 1),
                "decompress_MBps": round(len(data) / best_d / 1e6, 1),
                "ratio": round(len(framed) / len(data), 4),
            }
        ),
        flush=True,
    )


CORPUS = [
    "alice29.txt", "asyoulik.txt", "fireworks.jpeg", "geo.protodata",
    "html", "html_x_4", "kppkn.gtb", "lcet10.txt", "paper-100k.pdf",
    "plrabn12.txt", "urls.10K",
]


def config1() -> None:
    """Single 64 KiB block, one-shot call latency (dispatch-bound on
    the device; the native engine is the intended latency path)."""
    _setup_jax()
    from snappier_tpu.runtime import block

    html64 = _html()[: 64 * 1024]
    out = {}
    for eng in ("tpu", "native"):
        comp = block.compress(html64, engine=eng)
        assert block.decompress(comp, engine=eng) == html64
        tc = td = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            block.compress(html64, engine=eng)
            tc = min(tc, time.perf_counter() - t0)
            t0 = time.perf_counter()
            block.decompress(comp, engine=eng)
            td = min(td, time.perf_counter() - t0)
        out[eng] = (
            round(len(html64) / tc / 1e6, 1),
            round(len(html64) / td / 1e6, 1),
        )
    print(
        json.dumps(
            {
                "config": "1: single 64 KiB block one-shot (MB/s c/d)",
                "tpu": out["tpu"],
                "native": out["native"],
            }
        ),
        flush=True,
    )


def config2() -> None:
    """Full-corpus block API on the device engine: host bytes -> host
    bytes through compress/decompress for all 11 canonical files
    (includes fragment assembly and the host<->device transfers)."""
    _setup_jax()
    from snappier_tpu.runtime import block

    base = pathlib.Path("/root/reference/Snappier.Tests/TestData")
    files = [
        (base / n).read_bytes() for n in CORPUS if (base / n).exists()
    ]
    comps = [block.compress(d, engine="tpu") for d in files]
    for d, c in zip(files, comps):
        assert block.decompress(c, engine="tpu") == d
    total = sum(len(d) for d in files)
    tc = td = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        comps = [block.compress(d, engine="tpu") for d in files]
        tc = min(tc, time.perf_counter() - t0)
        t0 = time.perf_counter()
        outs = [block.decompress(c, engine="tpu") for c in comps]
        td = min(td, time.perf_counter() - t0)
    assert all(o == d for o, d in zip(outs, files))
    print(
        json.dumps(
            {
                "config": "2: full-corpus block API, device engine",
                "files": len(files),
                "total_MB": round(total / 1e6, 1),
                "compress_MBps": round(total / tc / 1e6, 1),
                "decompress_MBps": round(total / td / 1e6, 1),
                "ratio": round(sum(len(c) for c in comps) / total, 4),
            }
        ),
        flush=True,
    )


def main() -> None:
    which = sys.argv[1:] or ["config1", "config2", "config3", "config3n",
                             "config4"]
    if "config1" in which:
        config1()
    if "config2" in which:
        config2()
    if "config3" in which:
        config3()
    if "config3n" in which:
        config3_native()
    if "config4" in which:
        config4()


if __name__ == "__main__":
    main()
