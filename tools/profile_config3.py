"""Stage breakdown for BASELINE config 3 decompress (the 10.1 MB/s
round-4 mystery: host chunk machine alone measures 282 MB/s with the
native engine, so the loss is somewhere in the device path).

Stages measured on a 100 MB html framed stream:
  A. chunk-machine parse only (device decode stubbed out)
  B. payload staging (pool rent + row fill)          } submit
  C. device decode + CRC + word-pack, device-resident } per sub-batch
  D. packed fetch over the tunnel (np.asarray)
  E. full StreamDecompressor device path (what config 3 times)

Usage: python tools/profile_config3.py [size_mb]
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    size_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    import jax

    cache = pathlib.Path(__file__).parent.parent / ".jax_cache_tpu"
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import snappier_tpu as st
    import snappier_tpu.runtime.stream as sm
    from snappier_tpu.constants import BLOCK_SIZE

    html = pathlib.Path(
        "/root/reference/Snappier.Tests/TestData/html"
    ).read_bytes()
    data = (html * (size_mb * 1_000_000 // len(html) + 1))[
        : size_mb * 1_000_000
    ]
    framed = st.stream_compress(data, engine="native")
    print(f"{size_mb} MB -> {len(framed)} framed bytes")

    # --- A: parse only -------------------------------------------------
    real = sm._decompress_chunks_batched
    payload_box = []

    def capture(payloads, engine="auto"):
        payload_box.append(payloads)
        return (
            [data[i * 65536 : (i + 1) * 65536] for i in range(len(payloads))],
            [0] * len(payloads),
        )

    sm._decompress_chunks_batched = capture
    t0 = time.perf_counter()
    d = sm.StreamDecompressor(engine="tpu")
    try:
        d.decompress(framed)
    except Exception:
        pass  # CRC mismatch against stub bodies — parse already done
    tA = time.perf_counter() - t0
    sm._decompress_chunks_batched = real
    payloads = payload_box[0]
    print(f"A parse+assemble (decode stubbed): {tA:.2f}s "
          f"({len(payloads)} payloads)")

    # --- B/C/D: the device path, stage by stage -------------------------
    import jax.numpy as jnp

    use_crc = sm._device_crc_active()
    fn = sm._decode_crc_pack_fn(BLOCK_SIZE, use_crc)
    sub = sm._SUB_BATCH
    groups = [payloads[i : i + sub] for i in range(0, len(payloads), sub)]

    def stage_rows(group):
        width = max(len(p) for p in group)
        width = max(1024, 1 << (max(width, 1) - 1).bit_length())
        comp = np.zeros((sub, width), np.uint8)
        lens = np.zeros(sub, np.int32)
        for j, p in enumerate(group):
            a = np.frombuffer(p, np.uint8)
            comp[j, : len(a)] = a
            lens[j] = len(a)
        return comp, lens

    t0 = time.perf_counter()
    staged = [stage_rows(g) for g in groups]
    tB = time.perf_counter() - t0
    print(f"B host staging ({len(groups)} sub-batches of {sub}): {tB:.2f}s")

    # Warm the compile for every distinct comp width in the run.
    seen = set()
    for c, l in staged:
        if c.shape[1] not in seen:
            seen.add(c.shape[1])
            np.asarray(fn(c, l)[1])
    print(f"  (distinct comp widths: {sorted(seen)})")

    # C: device compute, device-resident args, fetch scalar leaf only.
    comp_d = [
        (jax.device_put(jnp.asarray(c)), jax.device_put(jnp.asarray(l)))
        for c, l in staged
    ]
    t0 = time.perf_counter()
    outs = [fn(c, l) for c, l in comp_d]
    for o in outs:
        np.asarray(o[1])  # barrier per sub-batch
    tC = time.perf_counter() - t0
    print(f"C device decode+CRC+pack: {tC:.2f}s "
          f"({size_mb / tC:.1f} MB/s device-resident)")

    # D: fetch the packed outputs.
    t0 = time.perf_counter()
    tot = 0
    for o in outs:
        tot += np.asarray(o[0]).nbytes
    tD = time.perf_counter() - t0
    print(f"D packed fetch: {tD:.2f}s ({tot / tD / 1e6:.1f} MB/s tunnel)")

    # E: the real path end to end.
    for _ in range(2):
        t0 = time.perf_counter()
        out = st.stream_decompress(framed, engine="tpu")
        tE = time.perf_counter() - t0
        print(f"E full device stream_decompress: {tE:.2f}s "
              f"({size_mb / tE:.1f} MB/s)")
    assert out == data


if __name__ == "__main__":
    main()
