"""Vectorized CRC32C kernel.

The reference computes CRCs byte-serially with SSE4.2/ARM CRC
instructions (Crc32CAlgorithm.cs:46-154). On TPU we use the GF(2)
linearization from :mod:`snappier_tpu.format.crc32c` (SURVEY.md §2.3
N6): the CRC of a chunk is an AND/XOR contraction of the message bits
against a precomputed per-distance contribution table, plus an affine
constant depending only on length — embarrassingly parallel VPU work,
one XOR reduction.

A chunk here is <= 64 KiB (the framing format's per-chunk cap,
SnappyStreamCompressor.cs:170-189). Data is presented *right-aligned*
conceptually: byte i of an n-byte message sits at distance n-1-i from
the end; we simply gather the table rows with that index so callers can
pass left-aligned zero-padded buffers and a traced length.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from snappier_tpu.constants import BLOCK_SIZE
from snappier_tpu.format.crc32c import lbit_table, zero_crc_table


@functools.cache
def _tables():
    """(LBIT packed to int32[BLOCK_SIZE, 8], Z int32[BLOCK_SIZE+1]).
    Cached as NumPy (jnp here would capture tracers under jit)."""
    lbit = lbit_table(BLOCK_SIZE).view(np.int32)
    z = zero_crc_table(BLOCK_SIZE).view(np.int32)
    return lbit, z


@jax.jit
def crc32c_block(data: jnp.ndarray, length: jnp.ndarray) -> jnp.ndarray:
    """CRC32C of ``data[:length]``.

    Args:
      data: int32[cap] byte values, cap <= BLOCK_SIZE, zero-padded.
      length: traced scalar actual length.

    Returns: uint32 CRC as an int32 scalar (bit pattern).
    """
    cap = data.shape[0]
    assert cap <= BLOCK_SIZE
    lbit_np, z_np = _tables()
    lbit, z = jnp.asarray(lbit_np), jnp.asarray(z_np)
    pos = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0)[:, 0]
    dist = jnp.clip(length - 1 - pos, 0, BLOCK_SIZE - 1)
    rows = lbit[dist]  # (cap, 8)
    b = data.astype(jnp.int32)
    bits = (b[:, None] >> jnp.arange(8, dtype=jnp.int32)[None, :]) & 1
    masked = jnp.where((bits > 0) & (pos < length)[:, None], rows, 0)
    lin = jax.lax.reduce(
        masked, jnp.int32(0), jax.lax.bitwise_xor, dimensions=(0, 1)
    )
    return lin ^ z[jnp.clip(length, 0, BLOCK_SIZE)]
