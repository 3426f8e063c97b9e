#!/bin/sh
# Recurring-check entry point (the reference's CI matrix analog,
# .github/workflows/main.yml): hermetic tests on the virtual 8-device
# CPU mesh, the multichip dryrun, and the randomized fuzz campaigns.
# On a machine with the TPU attached, add: python tools/fuzz_tpu.py
set -e
cd "$(dirname "$0")/.."

# Default leg: the full suite INCLUDES the reference-scale fuzz
# campaigns (tests/test_fuzz_campaigns.py: 20,000 native + 2,000
# stream + 2,000 scan + device-stream + scalar-kernel fragment fuzz).
python -m pytest tests/ -q

XLA_FLAGS=--xla_force_host_platform_device_count=8 python - <<'EOF'
import jax
jax.config.update("jax_platforms", "cpu")
from __graft_entry__ import dryrun_multichip
dryrun_multichip(8)
EOF

python benchmarks/run_all.py --quick

# No-native fallback leg over the FULL suite (reference matrix analog:
# the whole suite re-run with intrinsics disabled, main.yml:24,56-60).
# Native-only tests self-skip; the native fuzz campaigns self-skip; the
# oracle/JAX engines carry every remaining test.
SNAPPIER_NO_NATIVE=1 python -m pytest tests/ -q

# Multi-host ordered assembly at reduced size (full 256 MB: no args).
python tools/rehearsal_multihost.py 256 4 2
