"""Weak-scaling curve of the sharded codec step on a virtual CPU mesh.

BASELINE config 5 (>= 90% scaling to N hosts) needs pod hardware this
environment does not have; this tool produces the proxy the round-3
verdict asked for: wall-clock weak scaling of
``parallel.mesh.sharded_roundtrip_step`` (compress -> ordered-assembly
offsets -> decompress -> verify, the "training-step" analog) at
1/2/4/8 virtual CPU devices with a fixed per-device block count, and
the efficiency fraction t(1)/t(n) (ideal weak scaling = 1.0).

Each point runs in a FRESH subprocess: the virtual device count is a
process-wide XLA flag. Caveats reported in the artifact: this host has
a fixed physical core budget (``nproc``), so points beyond the core
count measure sharding/dispatch overhead under oversubscription, not
hardware scaling — on a real pod each mesh element is a whole chip.
The codec body is communication-free by construction (blocks are
independent; only the offsets cumsum and the verify reduction cross
shards), which is what makes linear scaling the expected outcome.

Usage: python tools/scaling_cpu.py [--out SCALING.json]
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent

#: Per-device workload: 8 x 8 KiB blocks (small static shape keeps the
#: per-point fresh compile tolerable; weak scaling is a ratio, so the
#: absolute throughput is irrelevant).
BLOCKS_PER_DEV = 8
FRAG = 8192

_CHILD = r"""
import json, os, sys, time
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.environ["SNAPPIER_CACHE"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.environ["SNAPPIER_REPO"])
from snappier_tpu.parallel.mesh import make_mesh, sharded_roundtrip_step

n = int(sys.argv[1]); bpd = int(sys.argv[2]); F = int(sys.argv[3])
devices = jax.devices()
assert len(devices) >= n, (len(devices), n)
mesh = make_mesh(devices[:n])

B = n * bpd
rng = np.random.default_rng(99)
base = b"weak scaling blocks ride the mesh "
text = (base * (-(-B * F // len(base))))[: B * F]
frags = np.frombuffer(text, np.uint8).reshape(B, F).astype(np.int32)
frags[::3, F // 2 :] = rng.integers(0, 256, (len(frags[::3]), F // 2))
lengths = np.full(B, F, np.int32)

def step():
    bodies, body_lens, offsets, ok = sharded_roundtrip_step(
        frags, lengths, mesh=mesh, kernel="scan"
    )
    assert bool(ok)
    return bodies

step()  # compile + correctness
iters = 8
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    for _ in range(iters):
        b = step()
    b.block_until_ready()
    best = min(best, (time.perf_counter() - t0) / iters)
print(json.dumps({"n": n, "seconds": best, "blocks": B, "frag": F}))
"""


def measure(n: int) -> dict:
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n}"
    ).strip()
    env["SNAPPIER_REPO"] = str(REPO)
    env["SNAPPIER_CACHE"] = str(REPO / ".jax_cache")
    r = subprocess.run(
        [sys.executable, "-c", _CHILD, str(n), str(BLOCKS_PER_DEV), str(FRAG)],
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    if r.returncode != 0:
        raise RuntimeError(f"n={n} failed:\n{r.stderr[-2000:]}")
    return json.loads(r.stdout.strip().splitlines()[-1])


def main() -> None:
    out_path = None
    if "--out" in sys.argv:
        out_path = pathlib.Path(sys.argv[sys.argv.index("--out") + 1])
    points = [measure(n) for n in (1, 2, 4, 8)]
    t1 = points[0]["seconds"]
    for p in points:
        p["weak_efficiency"] = round(t1 / p["seconds"], 3)
        p["blocks_per_s"] = round(p["blocks"] / p["seconds"], 1)
    result = {
        "metric": "weak scaling of sharded_roundtrip_step on a virtual CPU mesh",
        "blocks_per_device": BLOCKS_PER_DEV,
        "fragment_bytes": FRAG,
        "host_physical_cores": os.cpu_count(),
        "note": (
            "proxy for BASELINE config 5 (no pod hardware); points past "
            "the physical core count oversubscribe the host and bound "
            "sharding overhead, not hardware scaling"
        ),
        "points": points,
    }
    print(json.dumps(result, indent=2))
    if out_path:
        out_path.write_text(json.dumps(result, indent=2) + "\n")


if __name__ == "__main__":
    main()
