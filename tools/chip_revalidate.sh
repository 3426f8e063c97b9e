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
