#!/bin/sh
# One-shot revalidation after kernel changes, on the real chip.
# Order: cheapest sanity first, then differential fuzz, then timing.
# Run in background; each stage appends to the log as it lands.
set -e
cd "$(dirname "$0")/.."
echo "=== stage 0: device sanity ==="
python - <<'PY'
import jax
print("backend:", jax.default_backend(), "devices:", jax.devices())
PY
echo "=== stage 0.5: guarded small-shape kernel compiles ==="
# The service wedge began at the round-3 decode kernel's first compile;
# bound each fresh compile separately so a re-wedge is diagnosable.
timeout 900 python - <<'PY'
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", ".jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from snappier_tpu.format import oracle
from snappier_tpu.ops.pallas.scalar_codec import (
    decode_blocks_scalar, encode_blocks_scalar, encode_blocks_best)
data = b"the snappy corpus " * 40
comp = bytes(oracle.compress(np.frombuffer(data, np.uint8)))
a = np.zeros((1, 1024), np.int32); a[0, :len(comp)] = np.frombuffer(comp, np.uint8)
o, ol, e = decode_blocks_scalar(jnp.asarray(a), jnp.asarray([len(comp)]), out_cap=1024)
assert int(np.asarray(e)[0]) == 0
print("decode kernel compiles+runs ok")
f = np.zeros((1, 1024), np.int32); f[0, :len(data)] = np.frombuffer(data, np.uint8)
b, bl = encode_blocks_scalar(jnp.asarray(f), jnp.asarray([len(data)]))
print("encode kernel compiles+runs ok")
b, bl = encode_blocks_best(jnp.asarray(f), jnp.asarray([len(data)]))
print("best kernel compiles+runs ok")
PY
echo "=== stage 1: on-device differential fuzz (both kernels) ==="
python tools/fuzz_tpu.py 4 901
echo "=== stage 2: kernel timing (perf_r3) ==="
python tools/perf_r3.py 128
echo "=== stage 3: BASELINE configs ==="
python tools/bench_configs.py config1
python tools/bench_configs.py config2
python tools/bench_configs.py config3
python tools/bench_configs.py config4
echo "=== stage 4: bench.py ==="
python bench.py
echo "=== chip revalidation complete ==="
