#!/bin/sh
# Poll the axon TPU tunnel until it recovers, then exit 0.
# Recovery = device discovery answers AND a tiny fresh (salted) Pallas
# kernel compiles — the round-3 wedge hung at pallas compile while
# jax.devices() still answered, so both probes are required.
# Usage: tools/tpu_watch.sh [max_minutes]
cd "$(dirname "$0")/.."
MAX_MIN=${1:-600}
i=0
while [ "$i" -lt "$MAX_MIN" ]; do
    if timeout 60 python - <<'PY' >/tmp/tpu_probe.log 2>&1
import os, time
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "axon")
d = jax.devices()
from jax.experimental import pallas as pl
salt = int(time.time()) % 100000  # force a FRESH compile each probe

def k(x_ref, o_ref):
    o_ref[...] = x_ref[...] + salt

x = jnp.arange(1024, dtype=jnp.int32).reshape(8, 128)
y = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(x)
assert int(y[0, 0]) == salt
print("tpu ok", d)
PY
    then
        echo "TPU RECOVERED at $(date)"
        cat /tmp/tpu_probe.log
        exit 0
    fi
    i=$((i + 3))
    sleep 180
done
echo "TPU still down after ${MAX_MIN} minutes"
exit 1
