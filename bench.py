"""Benchmark harness: compress + decompress GB/s on the html corpus.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "GB/s", "vs_baseline": N, ...}

Metric definition (BASELINE.md): combined codec throughput
``2 * uncompressed_bytes / (t_compress + t_decompress)`` over batches
of 64 KiB blocks of the canonical ``html`` corpus file on one chip.

Baseline denominator: the reference publishes no absolute numbers
(SURVEY.md §6); upstream google/snappy documents ~250 MB/s compress
and ~500 MB/s decompress per CPU core, giving a combined
2/(1/0.25 + 1/0.5) = 0.333 GB/s — used as ``vs_baseline``'s 1.0x.
"""

from __future__ import annotations

import json
import pathlib
import subprocess
import sys
import time

import numpy as np

BASELINE_COMBINED_GBPS = 1.0 / 3.0

# Device-discovery probe timeout. The axon tunnel has wedged for hours
# at a time (jax.devices() itself hangs, uninterruptible in-process);
# probing in a bounded subprocess first turns "bench hangs forever"
# into an honest one-line error the driver can record.
import os

PROBE_TIMEOUT_S = int(os.environ.get("SNAPPIER_BENCH_PROBE_TIMEOUT", "300"))


def _device_reachable() -> bool:
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; print(jax.devices())"],
            timeout=PROBE_TIMEOUT_S,
            capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _load_html() -> bytes:
    p = pathlib.Path("/root/reference/Snappier.Tests/TestData/html")
    if p.exists():
        return p.read_bytes()
    rng = np.random.default_rng(7)
    words = [b"<html>", b"<body>", b"the", b"snappy", b"corpus", b"fallback"]
    return b" ".join(words[i] for i in rng.integers(0, len(words), 40000))


def main() -> None:
    if not _device_reachable():
        print(
            json.dumps(
                {
                    "metric": "compress+decompress GB/s/chip on html corpus",
                    "value": 0.0,
                    "unit": "GB/s",
                    "vs_baseline": 0.0,
                    "error": (
                        "device backend unreachable (discovery probe "
                        f"timed out after {PROBE_TIMEOUT_S}s; the axon "
                        "tunnel is down — see docs/ROADMAP.md round-3 log)"
                    ),
                }
            )
        )
        return

    import jax

    # bench_cache ships in the repo so the driver's fresh run skips the
    # multi-minute cold compiles (same chip topology).
    cache = pathlib.Path(__file__).parent / "bench_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from snappier_tpu.constants import BLOCK_SIZE
    from snappier_tpu.models.codec import SnappyCodec

    html = _load_html()
    B = 512  # 512 x 64 KiB = 32 MiB per device call (amortizes the ~5 ms dispatch)
    reps = -(-B * BLOCK_SIZE // len(html))
    tiled = (html * reps)[: B * BLOCK_SIZE]
    frags = np.frombuffer(tiled, np.uint8).reshape(B, BLOCK_SIZE).astype(np.int32)
    lengths = np.full(B, BLOCK_SIZE, np.int32)

    # Block-format codec throughput: the reference's block benchmarks
    # (Overview.BlockCompress64KbHtml) and the 250/500 MB/s google/snappy
    # denominator time the raw block codec — CRC32C belongs to the
    # framing format and is measured there (tools/bench_configs.py
    # config 3, device-side CRC kernel).
    codec = SnappyCodec(with_crc=False)
    frags_d = jax.device_put(jnp.asarray(frags))
    lengths_d = jax.device_put(jnp.asarray(lengths))

    # Warmup / compile. Setup fetches ride the packed-word path (4x
    # fewer bytes over remote-device transports).
    _, body_lens, crcs = codec.compress_batch(frags_d, lengths_d)
    packed, body_lens, _ = codec.compress_batch_packed(frags_d, lengths_d)
    bodies_h = np.asarray(packed).view(np.uint8)
    body_lens_h = np.asarray(body_lens)

    # Build decode input from the compressed output (3-byte preambles).
    pre = np.stack(
        [
            (lengths & 0x7F) | 0x80,
            ((lengths >> 7) & 0x7F) | 0x80,
            (lengths >> 14) & 0x7F,
        ],
        axis=1,
    ).astype(np.uint8)
    blocks = np.concatenate([pre, bodies_h], axis=1)
    pad = (-blocks.shape[1]) % 1024  # scalar-kernel DMA tiling
    blocks = np.concatenate(
        [blocks, np.zeros((B, pad), blocks.dtype)], axis=1
    )
    blocks_d = jax.device_put(jnp.asarray(blocks))
    block_lens_d = jax.device_put(jnp.asarray(body_lens_h + 3))
    outs, out_lens, errs = codec.decompress_batch(
        blocks_d, block_lens_d, out_cap=BLOCK_SIZE
    )
    outs.block_until_ready()
    assert int(np.max(np.asarray(errs))) == 0
    assert (np.asarray(outs[0])[: BLOCK_SIZE] == frags[0]).all(), "bench roundtrip"

    def timeit(fn, iters=5, passes=3):
        # Forcing a host fetch of a leaf is the only reliable completion
        # barrier through remote-device transports; best-of-N passes
        # suppresses transport jitter.
        np.asarray(jax.tree.leaves(fn())[1])  # warm
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
        lambda: codec.decompress_batch(blocks_d, block_lens_d, out_cap=BLOCK_SIZE)
    )

    nbytes = B * BLOCK_SIZE
    gb = nbytes / 1e9
    compress_gbps = gb / t_c
    decompress_gbps = gb / t_d
    combined = 2 * gb / (t_c + t_d)

    ratio = float(body_lens_h.sum()) / nbytes
    print(
        json.dumps(
            {
                "metric": "compress+decompress GB/s/chip on html corpus",
                "value": round(combined, 4),
                "unit": "GB/s",
                "vs_baseline": round(combined / BASELINE_COMBINED_GBPS, 3),
                # Measurement definition: raw block codec, CRC32C NOT
                # timed (matches the reference BlockCompressHtml and the
                # google/snappy denominator; CRC is timed in
                # tools/bench_configs.py config 3). NOTE: BENCH_r01 and
                # BENCH_r02 timed the CRC kernel inside t_compress —
                # r03+ numbers are not apples-to-apples with r01/r02.
                "with_crc": False,
                "compress_gbps": round(compress_gbps, 4),
                "decompress_gbps": round(decompress_gbps, 4),
                "compression_ratio": round(ratio, 4),
                "batch_blocks": B,
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
