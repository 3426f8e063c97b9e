"""Multi-host dress rehearsal at size (BASELINE config-5 mechanism,
scaled to this box): N localhost jax.distributed processes x M virtual
CPU devices compress a 256 MB corpus data-parallel over the global
mesh, each process writes only its addressable blocks' byte ranges
(the disjoint-range writer, parallel/distributed.py), and the parent
combines + verifies the stream bit-exactly.

This is the 10 GB multi-host config's full code path — coordinator,
global mesh, replicated assembly map, disjoint writes, ordered
concatenation — exercised for real without pod hardware (SURVEY.md
§2.4 multi-host row). Prints one JSON line.

Usage: python tools/rehearsal_multihost.py [n_blocks] [nprocs] [devs]
       (defaults: 4096 x 64 KiB = 256 MiB, 4 procs, 2 devices each)
"""

from __future__ import annotations

import json
import os
import pathlib
import socket
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(n_blocks: int, nprocs: int, devs: int, td: str) -> bool:
    """One coordinated worker fan-out; True when every worker exits 0."""
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={devs}"
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                str(REPO / "tools" / "dist_worker.py"),
                f"localhost:{port}",
                str(nprocs),
                str(pid),
                td,
                str(n_blocks),
            ],
            env=env,
        )
        for pid in range(nprocs)
    ]
    return all(p.wait() == 0 for p in procs)


def main() -> None:
    n_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    nprocs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    devs = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    t0 = time.time()
    with tempfile.TemporaryDirectory() as td:
        # One retry with a fresh port/tempdir: the coordinator bind and
        # Gloo rendezvous can flake transiently on a loaded host (a
        # spurious nightly failure observed once in round 5); a real
        # codec bug fails both attempts.
        if not _run_workers(n_blocks, nprocs, devs, td):
            print("worker fan-out failed; retrying once", file=sys.stderr)
            with tempfile.TemporaryDirectory() as td2:
                assert _run_workers(n_blocks, nprocs, devs, td2), (
                    "workers failed twice"
                )
                td = td2
                _finish(td, n_blocks, nprocs, devs, t0)
                return
        _finish(td, n_blocks, nprocs, devs, t0)


def _finish(td: str, n_blocks: int, nprocs: int, devs: int, t0) -> None:
    t_compress = time.time() - t0

    metas = [
        json.loads((pathlib.Path(td) / f"meta_{pid}.json").read_text())
        for pid in range(nprocs)
    ]
    payloads = [
        np.frombuffer(
            (pathlib.Path(td) / f"payload_{pid}.bin").read_bytes(),
            np.uint8,
        )
        for pid in range(nprocs)
    ]

    for m in metas[1:]:
        assert m["block_offsets"] == metas[0]["block_offsets"]
    combined = payloads[0].copy()
    for m, p in zip(metas[1:], payloads[1:]):
        for i in m["local_blocks"]:
            o, ln = m["block_offsets"][i], m["block_lengths"][i]
            combined[o : o + ln] = p[o : o + ln]

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "dist_worker", REPO / "tools" / "dist_worker.py"
    )
    dist_worker = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(dist_worker)
    data = dist_worker.corpus(n_blocks)

    from snappier_tpu.runtime import native

    t1 = time.time()
    if native.available():
        out = native.decompress(combined.tobytes())
    else:  # pragma: no cover - toolchainless fallback
        from snappier_tpu.format import oracle

        out = oracle.decompress(combined.tobytes())
    assert out == data, "rehearsal stream mismatch"
    print(
        json.dumps(
            {
                "rehearsal": "multi-host ordered assembly",
                "nprocs": nprocs,
                "devices_per_proc": devs,
                "blocks": n_blocks,
                "uncompressed_MB": round(len(data) / 1e6, 1),
                "compressed_MB": round(len(combined) / 1e6, 1),
                "compress_wall_s": round(t_compress, 1),
                "verify_wall_s": round(time.time() - t1, 1),
                "bit_exact": True,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
