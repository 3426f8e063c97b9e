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


def _is_axon_tunnel() -> bool:
    """True on the axon development tunnel (a remote single-chip TPU
    attachment whose compile service wedges on shard_map+pallas_call —
    docs/ROADMAP.md). Real pods return False."""
    import os

    if "axon" in os.environ.get("JAX_PLATFORMS", "").lower():
        return True
    try:
        # jax.config.update("jax_platforms", "axon") does NOT set the
        # env var (the repo's own tools select the platform that way).
        if "axon" in (jax.config.jax_platforms or "").lower():
            return True
    except AttributeError:  # pragma: no cover - older jax config layout
        pass
    try:
        d = jax.devices()[0]
        return "axon" in type(d).__name__.lower() or "axon" in (
            getattr(d, "platform", "") or ""
        )
    except Exception:  # pragma: no cover - backend init failure
        return False


@functools.cache
def default_kernel(sharded: bool = False) -> str:
    """THE backend-probed kernel choice, shared by the batched
    (models/runtime) and sharded (parallel.mesh) paths — round-2 review
    flagged that they answered this question differently, silently.

    Order: ``SNAPPIER_KERNEL`` env override; 'scan' (portable XLA
    kernels) off-TPU; 'scan' for *sharded* use on the axon tunnel
    (shard_map of Pallas kernels wedges its remote-compile service);
    otherwise the production 'scalar' Pallas kernels. Logged once per
    (sharded) variant on logger ``snappier_tpu``."""
    import logging
    import os

    k = os.environ.get("SNAPPIER_KERNEL")
    if k is not None and k not in ("scalar", "scan"):
        logging.getLogger("snappier_tpu").warning(
            "SNAPPIER_KERNEL=%r is not 'scalar' or 'scan'; ignoring "
            "the override and probing the backend instead",
            k,
        )
        k = None
    if k in ("scalar", "scan"):
        choice, why = k, "SNAPPIER_KERNEL override"
    elif jax.default_backend() != "tpu":
        choice = "scan"
        why = f"portable kernels on the {jax.default_backend()} backend"
    elif sharded and _is_axon_tunnel():
        choice = "scan"
        why = (
            "axon tunnel: shard_map+pallas wedges its remote compiler; "
            "real pods default to scalar (SNAPPIER_KERNEL=scalar forces)"
        )
    else:
        choice, why = "scalar", "TPU backend, production Pallas kernels"
    logging.getLogger("snappier_tpu").info(
        "kernel=%s sharded=%s (%s)", choice, sharded, why
    )
    return choice


def _default_kernel() -> str:
    """'scalar' (Pallas scalar-core codec) on real TPUs, 'scan' (the
    portable XLA parallel-scan codec) elsewhere. See
    ops/pallas/scalar_codec.py for the measured rationale."""
    return default_kernel()


@jax.jit
def pack_rows(rows):
    """Byte rows (B, W) with W % 4 == 0 -> word-packed int32 (B, W//4)
    (4 LE bytes per lane). Disjoint byte fields make two's-complement
    addition equal bitwise OR, so the sum is the exact bit pattern.
    Round-3 transfer fix: device->host fetches of byte-per-int32 rows
    moved 4x the payload; callers fetch packed words and
    ``.view(np.uint8)`` host-side."""
    B, W = rows.shape
    r = rows.astype(jnp.int32).reshape(B, W // 4, 4)
    sh = jnp.arange(4, dtype=jnp.int32) * 8
    return (r << sh[None, None, :]).sum(axis=2, dtype=jnp.int32)


@functools.partial(jax.jit, static_argnames=("cap_words",))
def compact_words(words, wlens, cap_words: int):
    """Ragged device-side compaction: concatenate the first wlens[i]
    words of every row into one flat buffer (gather by prefix-sum +
    searchsorted). The caller picks ``cap_words`` >= sum(wlens)
    (bucketed to bound recompiles) and fetches only ``[:total]`` — so
    a batch of mostly-empty fixed slots ships at its true size instead
    of the slot capacity (the dominant cost of the round-2 device
    stream path)."""
    ends = jnp.cumsum(wlens.astype(jnp.int32))
    starts = ends - wlens
    j = jnp.arange(cap_words, dtype=jnp.int32)
    row = jnp.searchsorted(ends, j, side="right").astype(jnp.int32)
    rowc = jnp.clip(row, 0, words.shape[0] - 1)
    col = j - starts[rowc]
    return words[rowc, jnp.clip(col, 0, words.shape[1] - 1)]


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

    def decompress_batch_fn(self, out_cap: int, packed: bool = False):
        # Normalize before the cache: `fn(cap)` and `fn(cap, False)`
        # must share one compiled graph (functools.cache keys by the
        # exact call shape, which once caused a duplicate multi-second
        # XLA compile of the 64 KiB decode kernel).
        return self._decompress_batch_fn(int(out_cap), bool(packed))

    @functools.cache
    def _decompress_batch_fn(self, out_cap: int, packed: bool):
        if self.kernel == "scalar":
            from snappier_tpu.ops.pallas.scalar_codec import (
                decode_blocks_scalar,
            )

            def fn(comp, comp_lens):
                return decode_blocks_scalar(
                    comp.astype(jnp.int32),
                    comp_lens.astype(jnp.int32),
                    out_cap=out_cap,
                    packed=packed,
                )

        else:

            def fn(comp, comp_lens):
                outs, out_lens, errs = jax.lax.map(
                    lambda t: decode_block(t[0], t[1], out_cap=out_cap),
                    (comp.astype(jnp.int32), comp_lens.astype(jnp.int32)),
                )
                if packed:
                    outs = pack_rows(outs)
                return outs, out_lens, errs

        return jax.jit(fn)

    def decompress_batch(
        self, comp, comp_lens, out_cap: int | None = None,
        packed: bool = False,
    ):
        """[B, C], [B] -> (outs [B, out_cap], out_lens [B], errs [B]);
        with ``packed``, outs is int32 [B, out_cap//4] word-packed."""
        return self.decompress_batch_fn(
            out_cap or self.fragment_size, packed
        )(comp, comp_lens)

    @functools.cached_property
    def frame_batch(self):
        """jit[B, F], [B] -> (framed uint8 [B, 8 + 3 + F + 2048],
        framed_lens [B]): the ENTIRE framing data-chunk pipeline on
        device — encode, CRC32C + masking, varint preamble, chunk
        header, and the uncompressed fallback
        (SnappyStreamCompressor.cs:166-261) — leaving the host only the
        ragged concatenation of rows. Rows with length 0 are emitted
        with framed_len 0 (batch padding; callers skip them)."""

        F = self.fragment_size
        PC = 3 + F + 2048  # varint(<=3 for F<=64Ki) + emission bound

        def fn(frags, lengths):
            frags = frags.astype(jnp.int32)
            lengths = lengths.astype(jnp.int32)
            B = frags.shape[0]
            bodies, body_lens, crcs = self.compress_batch(frags, lengths)

            # Masked CRC32C (Crc32CAlgorithm.cs:157) in uint32 space.
            c = jax.lax.bitcast_convert_type(crcs, jnp.uint32)
            masked = jax.lax.bitcast_convert_type(
                ((c >> 15) | (c << 17)) + jnp.uint32(0xA282EAD8), jnp.int32
            )

            # Varint preamble: lengths <= 65536 -> 1..3 bytes. Build the
            # three statically-shifted payload images and select per row
            # (a per-row dynamic roll would gather; selects fuse).
            pre_len = jnp.where(
                lengths < 128, 1, jnp.where(lengths < 16384, 2, 3)
            )
            b0 = jnp.where(
                pre_len == 1, lengths & 0x7F, (lengths & 0x7F) | 0x80
            )
            b1 = jnp.where(
                pre_len == 2,
                (lengths >> 7) & 0x7F,
                ((lengths >> 7) & 0x7F) | 0x80,
            )
            b2 = (lengths >> 14) & 0x7F

            def shifted(k):  # bodies shifted right by k preamble bytes
                pre = jnp.stack([b0, b1, b2][:k], axis=1)
                pad = jnp.zeros((B, PC - k - bodies.shape[1]), jnp.int32)
                return jnp.concatenate([pre, bodies, pad], axis=1)

            comp_img = jnp.where(
                (pre_len == 1)[:, None],
                shifted(1),
                jnp.where((pre_len == 2)[:, None], shifted(2), shifted(3)),
            )
            comp_len = pre_len + body_lens

            # Incompressibility fallback (SnappyStreamCompressor.cs
            # :213-229): raw bytes when compression did not shrink.
            fallback = comp_len >= lengths
            raw_img = jnp.concatenate(
                [frags, jnp.zeros((B, PC - F), jnp.int32)], axis=1
            )
            payload = jnp.where(fallback[:, None], raw_img, comp_img)
            payload_len = jnp.where(fallback, lengths, comp_len)

            # Chunk header: type byte + 3-byte LE length (of CRC+payload).
            ctype = jnp.where(fallback, 1, 0)
            clen = payload_len + 4
            hdr = jnp.stack(
                [ctype, clen & 0xFF, (clen >> 8) & 0xFF, (clen >> 16) & 0xFF],
                axis=1,
            )
            crc_bytes = jnp.stack(
                [
                    masked & 0xFF,
                    (masked >> 8) & 0xFF,
                    (masked >> 16) & 0xFF,
                    (masked >> 24) & 0xFF,
                ],
                axis=1,
            )
            framed = jnp.concatenate([hdr, crc_bytes, payload], axis=1)
            framed_len = jnp.where(lengths > 0, 8 + payload_len, 0)
            return framed.astype(jnp.uint8), framed_len

        return jax.jit(fn)

    @functools.cached_property
    def compress_batch_packed(self):
        """compress_batch with word-packed bodies (int32, 4 LE bytes
        per lane) for 4x cheaper host fetch; lengths/crcs unchanged."""
        inner = self.compress_batch

        def fn(frags, lengths):
            bodies, body_lens, crcs = inner(frags, lengths)
            B, W = bodies.shape
            pad = (-W) % 4
            if pad:
                bodies = jnp.concatenate(
                    [bodies, jnp.zeros((B, pad), bodies.dtype)], axis=1
                )
            return pack_rows(bodies), body_lens, crcs

        return jax.jit(fn)

    @functools.cached_property
    def frame_batch_packed(self):
        """frame_batch with word-packed rows; pair with compact_words
        so a ragged framed batch ships to the host at its true size."""
        inner = self.frame_batch

        def fn(frags, lengths):
            framed, flens = inner(frags, lengths)
            B, PC = framed.shape
            pad = (-PC) % 4
            if pad:
                framed = jnp.concatenate(
                    [framed, jnp.zeros((B, pad), framed.dtype)], axis=1
                )
            return pack_rows(framed), flens

        return jax.jit(fn)

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
