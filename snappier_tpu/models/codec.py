"""The flagship pipeline: a batched Snappy codec as a single jittable
computation graph.

``SnappyCodec`` bundles the three device kernels (encode, decode,
CRC32C) into the shapes the framework actually ships: batch-of-blocks
compress, batch decode, and a full round-trip step with on-device
verification. These are the functions benchmarked by ``bench.py``,
compile-checked by ``__graft_entry__.entry`` and sharded by
:mod:`snappier_tpu.parallel`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from snappier_tpu.constants import BLOCK_SIZE
from snappier_tpu.ops.crc32c import crc32c_block
from snappier_tpu.ops.decode import decode_block
from snappier_tpu.ops.encode import encode_block


class SnappyCodec:
    """Batched block codec with a fixed fragment size.

    Args:
      fragment_size: static per-block size (64 KiB in production; the
        format's LZ window, Constants.cs:25-27).
      with_crc: also emit the framing format's per-block CRC32C
        (Crc32CAlgorithm parity) during compression.
    """

    def __init__(self, fragment_size: int = BLOCK_SIZE, with_crc: bool = True):
        assert fragment_size <= BLOCK_SIZE
        self.fragment_size = fragment_size
        self.with_crc = with_crc

    @functools.cached_property
    def compress_batch(self):
        """jit[B, F], [B] -> (bodies [B, F+128], body_lens [B], crcs [B])"""

        def fn(frags, lengths):
            frags = frags.astype(jnp.int32)
            lengths = lengths.astype(jnp.int32)
            # lax.map, not vmap: the block kernels are built from sorts/
            # gathers whose vmapped lowering is no faster than a serial
            # loop on TPU, while map keeps the single-block kernel shape
            # the backend compiles well.
            bodies, body_lens = jax.lax.map(
                lambda t: encode_block(*t), (frags, lengths)
            )
            if self.with_crc:
                crcs = jax.lax.map(lambda t: crc32c_block(*t), (frags, lengths))
            else:
                crcs = jnp.zeros_like(lengths)
            return bodies, body_lens, crcs

        return jax.jit(fn)

    @functools.cache
    def decompress_batch_fn(self, out_cap: int):
        def fn(comp, comp_lens):
            return jax.lax.map(
                lambda t: decode_block(t[0], t[1], out_cap=out_cap),
                (comp.astype(jnp.int32), comp_lens.astype(jnp.int32)),
            )

        return jax.jit(fn)

    def decompress_batch(self, comp, comp_lens, out_cap: int | None = None):
        """[B, C], [B] -> (outs [B, out_cap], out_lens [B], errs [B])"""
        return self.decompress_batch_fn(out_cap or self.fragment_size)(
            comp, comp_lens
        )

    @functools.cached_property
    def roundtrip_step(self):
        """Compress + decompress + bit-exact check, one jitted graph."""

        F = self.fragment_size

        def fn(frags, lengths):
            frags = frags.astype(jnp.int32)
            lengths = lengths.astype(jnp.int32)
            bodies, body_lens, crcs = self.compress_batch(frags, lengths)
            pre = jnp.stack(
                [
                    (lengths & 0x7F) | 0x80,
                    ((lengths >> 7) & 0x7F) | 0x80,
                    (lengths >> 14) & 0x7F,
                ],
                axis=1,
            )
            blocks = jnp.concatenate([pre, bodies], axis=1)
            outs, out_lens, errs = jax.vmap(
                lambda c, n: decode_block(c, n, out_cap=F)
            )(blocks, body_lens + 3)
            pos = jax.lax.broadcasted_iota(jnp.int32, outs.shape, 1)
            ok = (
                jnp.all(jnp.where(pos < lengths[:, None], outs == frags, True))
                & jnp.all(errs == 0)
                & jnp.all(out_lens == lengths)
            )
            return bodies, body_lens, crcs, ok

        return jax.jit(fn)
