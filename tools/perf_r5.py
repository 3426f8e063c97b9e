"""Round-5 ablation probe (verdict item 5): A/B the production
kernels at bench.py's exact methodology — B=512 html blocks,
device-resident arrays, HOST FETCH of a leaf as the completion
barrier (block_until_ready is NOT a reliable barrier through the
axon remote transport: a block_until_ready-timed version of this
probe measured encode at an impossible 171 us/block — it was timing
dispatch, not execution), best-of-3 passes of 5 queued iterations.

Measured 2026-08-20 (this file's two variants):
  baseline (r4 kernels)        encode 609.2 us/block, decode 400.5
  + encode inline warmup       encode 596.9 (-2.1%)   LANDED
  + decode aligned-off path    decode 432.1 (+7.9%)   REJECTED

Usage: python tools/perf_r5.py [tag]
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "probe"
    import jax
    import jax.numpy as jnp

    cache = pathlib.Path(__file__).parent.parent / "bench_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from snappier_tpu.constants import BLOCK_SIZE
    from snappier_tpu.models.codec import SnappyCodec

    html = pathlib.Path(
        "/root/reference/Snappier.Tests/TestData/html"
    ).read_bytes()
    B = 512
    reps = -(-B * BLOCK_SIZE // len(html))
    tiled = (html * reps)[: B * BLOCK_SIZE]
    frags = np.frombuffer(tiled, np.uint8).reshape(B, BLOCK_SIZE)
    frags = frags.astype(np.int32)
    lengths = np.full(B, BLOCK_SIZE, np.int32)
    codec = SnappyCodec(with_crc=False)
    fd = jax.device_put(jnp.asarray(frags))
    ld = jax.device_put(jnp.asarray(lengths))
    packed, blens, _ = codec.compress_batch_packed(fd, ld)
    bodies_h = np.asarray(packed).view(np.uint8)
    blens_h = np.asarray(blens)
    pre = np.stack(
        [
            (lengths & 0x7F) | 0x80,
            ((lengths >> 7) & 0x7F) | 0x80,
            (lengths >> 14) & 0x7F,
        ],
        axis=1,
    ).astype(np.uint8)
    blocks = np.concatenate([pre, bodies_h], axis=1)
    pad = (-blocks.shape[1]) % 1024
    blocks = np.concatenate([blocks, np.zeros((B, pad), blocks.dtype)], 1)
    bd = jax.device_put(jnp.asarray(blocks))
    bld = jax.device_put(jnp.asarray(blens_h + 3))
    outs, olens, errs = codec.decompress_batch(bd, bld, out_cap=BLOCK_SIZE)
    assert int(np.max(np.asarray(errs))) == 0

    def timeit(fn, iters=5, passes=3):
        np.asarray(jax.tree.leaves(fn())[1])  # warm + reliable barrier
        best = float("inf")
        for _ in range(passes):
            t0 = time.perf_counter()
            for _ in range(iters):
                r = fn()
            np.asarray(jax.tree.leaves(r)[1])
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    t_c = timeit(lambda: codec.compress_batch(fd, ld))
    t_d = timeit(
        lambda: codec.decompress_batch(bd, bld, out_cap=BLOCK_SIZE)
    )
    nb = B * BLOCK_SIZE
    print(
        f"{tag}: encode {t_c/B*1e6:7.1f} us/block {nb/t_c/1e9:.4f} GB/s | "
        f"decode {t_d/B*1e6:7.1f} us/block {nb/t_d/1e9:.4f} GB/s | "
        f"combined {2*nb/(t_c+t_d)/1e9:.4f}"
    )


if __name__ == "__main__":
    main()
