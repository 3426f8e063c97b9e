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


def _default_kernel() -> str:
    """'scalar' (Pallas scalar-core codec) on real TPUs, 'scan' (the
    portable XLA parallel-scan codec) elsewhere. See
    ops/pallas/scalar_codec.py for the measured rationale."""
    return "scalar" if jax.default_backend() == "tpu" else "scan"


class SnappyCodec:
    """Batched block codec with a fixed fragment size.

    Args:
      fragment_size: static per-block size (64 KiB in production; the
        format's LZ window, Constants.cs:25-27).
      with_crc: also emit the framing format's per-block CRC32C
        (Crc32CAlgorithm parity) during compression.
      kernel: 'scalar' | 'scan' | None (auto by backend).
      hash_bits: scalar-encoder match-table size log2 (SURVEY §5.6
        tunable; reference HashTable.cs:14-18 sizes 8..14).
      skip_base: scalar-encoder skip-heuristic start constant
        (SnappyCompressor.cs:227).
    """

    def __init__(
        self,
        fragment_size: int = BLOCK_SIZE,
        with_crc: bool = True,
        kernel: str | None = None,
        hash_bits: int = 15,
        skip_base: int = 32,
    ):
        assert fragment_size <= BLOCK_SIZE
        self.fragment_size = fragment_size
        self.with_crc = with_crc
        self.kernel = kernel or _default_kernel()
        self.hash_bits = hash_bits
        self.skip_base = skip_base

    @functools.cached_property
    def compress_batch(self):
        """jit[B, F], [B] -> (bodies [B, F+128], body_lens [B], crcs [B])"""

        def fn(frags, lengths):
            frags = frags.astype(jnp.int32)
            lengths = lengths.astype(jnp.int32)
            if self.kernel == "scalar":
                from snappier_tpu.ops.pallas.scalar_codec import (
                    encode_blocks_scalar,
                )

                bodies, body_lens = encode_blocks_scalar(
                    frags,
                    lengths,
                    hash_bits=self.hash_bits,
                    skip_base=self.skip_base,
                )
            else:
                # lax.map, not vmap: the scan kernels are built from
                # sorts/gathers whose vmapped lowering is no faster than
                # a serial loop on TPU; map keeps the single-block
                # kernel shape the backend compiles well.
                bodies, body_lens = jax.lax.map(
                    lambda t: encode_block(*t), (frags, lengths)
                )
            if not self.with_crc:
                crcs = jnp.zeros_like(lengths)
            elif self.kernel == "scalar" and frags.shape[1] == BLOCK_SIZE:
                from snappier_tpu.ops.pallas.crc32c import crc32c_blocks

                crcs = crc32c_blocks(frags, lengths)
            else:
                crcs = jax.lax.map(lambda t: crc32c_block(*t), (frags, lengths))
            return bodies, body_lens, crcs

        return jax.jit(fn)

    @functools.cache
    def decompress_batch_fn(self, out_cap: int):
        if self.kernel == "scalar":
            from snappier_tpu.ops.pallas.scalar_codec import (
                decode_blocks_scalar,
            )

            def fn(comp, comp_lens):
                return decode_blocks_scalar(
                    comp.astype(jnp.int32),
                    comp_lens.astype(jnp.int32),
                    out_cap=out_cap,
                )

        else:

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
            pad = (-(3 + bodies.shape[1])) % 1024  # scalar-kernel DMA tiling
            blocks = jnp.concatenate(
                [pre, bodies, jnp.zeros((bodies.shape[0], pad), jnp.int32)],
                axis=1,
            )
            outs, out_lens, errs = self.decompress_batch_fn(F)(
                blocks, body_lens + 3
            )
            pos = jax.lax.broadcasted_iota(jnp.int32, outs.shape, 1)
            ok = (
                jnp.all(jnp.where(pos < lengths[:, None], outs == frags, True))
                & jnp.all(errs == 0)
                & jnp.all(out_lens == lengths)
            )
            return bodies, body_lens, crcs, ok

        return jax.jit(fn)
