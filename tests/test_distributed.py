"""Two-process jax.distributed execution of the sharded compressor.

Spawns two local worker processes joined through a localhost
coordinator (4 virtual CPU devices each -> one 8-device global mesh),
runs ``compress_corpus_sharded`` in both, and asserts:

* both processes computed identical ordered-assembly maps;
* their local-block sets partition the batch;
* the union of their partial payloads is a complete stream that
  decodes bit-exactly on the oracle.

This is the multi-host data-parallel contract of SURVEY.md §2.4 /
BASELINE configs 4-5, exercised for real (two OS processes, a real
coordinator service) without TPU pod hardware.
"""

from __future__ import annotations

import json
import os
import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
@pytest.mark.parametrize(
    "nprocs,devs_per_proc,n_blocks",
    [
        (2, 4, 8),  # the original 2-host shape
        (4, 2, 16),  # wider host fan-out, fewer devices per host
    ],
)
def test_multi_process_sharded_compress(
    tmp_path, nprocs, devs_per_proc, n_blocks
):
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devs_per_proc}"
    )
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                str(REPO / "tools" / "dist_worker.py"),
                f"localhost:{port}",
                str(nprocs),
                str(pid),
                str(tmp_path),
                str(n_blocks),
            ],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for pid in range(nprocs)
    ]
    logs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            logs.append(out.decode(errors="replace"))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("jax.distributed workers timed out in this environment")
    for p, log in zip(procs, logs):
        if p.returncode != 0:
            if "distributed" in log and (
                "unimplemented" in log.lower() or "unavailable" in log.lower()
            ):
                pytest.skip(f"jax.distributed unsupported here: {log[-400:]}")
            raise AssertionError(f"worker failed:\n{log[-2000:]}")

    metas = [
        json.loads((tmp_path / f"meta_{pid}.json").read_text())
        for pid in range(nprocs)
    ]
    payloads = [
        np.frombuffer(
            (tmp_path / f"payload_{pid}.bin").read_bytes(), np.uint8
        )
        for pid in range(nprocs)
    ]

    # Identical assembly maps on every process.
    for m in metas[1:]:
        assert m["block_lengths"] == metas[0]["block_lengths"]
        assert m["block_offsets"] == metas[0]["block_offsets"]
    assert metas[0]["process_count"] == nprocs
    assert len({len(p) for p in payloads}) == 1

    # Local blocks partition the batch (disjoint, complete, non-empty).
    nblocks = len(metas[0]["block_lengths"])
    locals_ = [set(m["local_blocks"]) for m in metas]
    union: set = set()
    for lb in locals_:
        assert lb, "a process produced no blocks"
        assert union.isdisjoint(lb)
        union |= lb
    assert union == set(range(nblocks))

    # Union of the disjoint partial payloads = complete bit-exact stream.
    combined = payloads[0].copy()
    for m, p in zip(metas[1:], payloads[1:]):
        for i in m["local_blocks"]:
            o = m["block_offsets"][i]
            ln = m["block_lengths"][i]
            combined[o : o + ln] = p[o : o + ln]

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "dist_worker", REPO / "tools" / "dist_worker.py"
    )
    dist_worker = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(dist_worker)

    from snappier_tpu.format import oracle

    data = dist_worker.corpus(n_blocks)
    assert oracle.decompress(combined.tobytes()) == data

    # Decode twin (round-5 verdict item 2): the workers also ran
    # decompress_corpus_sharded on a shared variable-length stream.
    # Their local-fragment sets must partition the batch and the union
    # of partial plaintexts must be bit-exact.
    sdata, _ = dist_worker.stream_case(3 * nprocs + 2)
    plains = [
        np.frombuffer((tmp_path / f"plain_{pid}.bin").read_bytes(), np.uint8)
        for pid in range(nprocs)
    ]
    for m in metas[1:]:
        assert m["fragment_lengths"] == metas[0]["fragment_lengths"]
        assert m["fragment_offsets"] == metas[0]["fragment_offsets"]
    nfr = len(metas[0]["fragment_lengths"])
    union = set()
    for m in metas:
        lf = set(m["local_fragments"])
        assert lf, "a process decoded no fragments"
        assert union.isdisjoint(lf)
        union |= lf
    assert union == set(range(nfr))
    combined_plain = plains[0].copy()
    for m, p in zip(metas[1:], plains[1:]):
        for i in m["local_fragments"]:
            o = m["fragment_offsets"][i]
            ln = m["fragment_lengths"][i]
            combined_plain[o : o + ln] = p[o : o + ln]
    assert combined_plain.tobytes() == sdata
