"""CRC32C as a Pallas VPU kernel.

The GF(2) linearization (see :mod:`snappier_tpu.format.crc32c`) makes
the CRC an AND/XOR contraction of message bits against per-distance
constant columns. XLA's ``lax.reduce`` with xor over the (64K, 8)
contribution array runs ~3 ms/block on v5e; this kernel does the same
contraction as 8 masked XORs plus a logarithmic fold, entirely on the
VPU, in tens of microseconds.

Distance alignment: the caller right-aligns each message inside its
64 KiB row (leading zero bytes contribute nothing to the linear part),
so the per-distance table is a static constant; the length-dependent
affine term ``Z[n]`` is XOR'd on afterwards.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from snappier_tpu.constants import BLOCK_SIZE
from snappier_tpu.format.crc32c import lbit_table, zero_crc_table


_ROWS = BLOCK_SIZE // 128


@functools.cache
def _lbit_rev() -> np.ndarray:
    """(8, ROWS, 128) int32: LBIT columns indexed by *position* for a
    right-aligned message (position i has distance BLOCK_SIZE-1-i).
    Cached as NumPy — caching a jnp array here would capture a tracer
    when first touched inside a jit trace."""
    t = lbit_table(BLOCK_SIZE)[::-1].T.copy()  # (8, BLOCK_SIZE) uint32
    return t.view(np.int32).reshape(8, _ROWS, 128)


def _crc_kernel(data_ref, lbit_ref, out_ref):
    b = pl.program_id(0)
    d = data_ref[0]
    x = jnp.zeros((_ROWS, 128), jnp.int32)
    for j in range(8):
        mask = -((d >> j) & 1)  # 0 or all-ones per element
        x = x ^ (lbit_ref[j] & mask)
    r = _ROWS
    while r > 8:
        half = r // 2
        x = x[:half] ^ x[half:r]
        r = half
    c = 128
    while c > 1:
        half = c // 2
        x = x[:, :half] ^ x[:, half:c]
        c = half
    while r > 1:
        half = r // 2
        x = x[:half] ^ x[half:r]
        r = half
    out_ref[b] = x[0, 0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def crc32c_blocks(frags, lengths, interpret: bool | None = None):
    """CRC32C of each row's first ``lengths[b]`` bytes.

    Args:
      frags: int32[B, BLOCK_SIZE] byte values; bytes past ``lengths[b]``
        may hold anything (they are masked here).
      lengths: int32[B].
      interpret: run in the Pallas interpreter (defaults to True
        off-TPU, so hermetic CPU tests cover this kernel).

    Returns: int32[B] CRC bit patterns.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    frags = frags.astype(jnp.int32)
    B, F = frags.shape
    assert F == BLOCK_SIZE
    lengths = lengths.astype(jnp.int32)
    # Mask bytes past each row's length: callers (notably the decode
    # kernels, which over-store garbage words past the output frontier)
    # do NOT guarantee zero tails, and the right-align roll below turns
    # tail bytes into leading bytes whose only safe value is zero.
    frags = jnp.where(
        jnp.arange(F, dtype=jnp.int32)[None, :] < lengths[:, None], frags, 0
    )
    # Right-align each message (leading zeros are linear-part no-ops).
    rolled = jax.vmap(lambda r, l: jnp.roll(r, BLOCK_SIZE - l))(
        frags, lengths
    )
    lin = pl.pallas_call(
        _crc_kernel,
        grid=(B,),
        out_shape=jax.ShapeDtypeStruct((B,), jnp.int32),
        in_specs=[
            pl.BlockSpec(
                (1, _ROWS, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (8, _ROWS, 128), lambda b: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        interpret=interpret,
    )(rolled.reshape(B, _ROWS, 128), jnp.asarray(_lbit_rev()))
    z = jnp.asarray(zero_crc_table(BLOCK_SIZE).view(np.int32))
    return lin ^ z[jnp.clip(lengths, 0, BLOCK_SIZE)]
