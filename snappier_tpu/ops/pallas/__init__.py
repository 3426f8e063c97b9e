"""Pallas TPU kernels: the hardware-native hot paths.

Two families:

* ``scalar_codec`` — the production block codec on the TPU scalar
  core + SMEM. Measurement on real v5e hardware (see
  docs/ARCHITECTURE.md) shows XLA's gather/scatter primitives execute
  at ~135M elem/s, making the log-step parallel-scan codec
  (:mod:`snappier_tpu.ops.decode` / ``encode``) launch-overhead-bound;
  a sequential SMEM walk at ~50 cycles/iteration is an order of
  magnitude faster per block and batches across blocks via the grid.
* ``crc32c`` — the GF(2)-linearized CRC as a pure-VPU kernel.
"""
