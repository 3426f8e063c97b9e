"""Device-mesh sharding of the batch codec.

The reference is single-threaded/single-process (SURVEY.md §2.4); the
parallelism here is *new capability* grounded in the format's
independence structure: 64 KiB fragments compress independently
(SnappyCompressor.cs:40-80) and framing chunks decode independently
given boundaries, so the block axis is simultaneously the
data-parallel AND the sequence-parallel ("context") axis — arbitrarily
long streams scale linearly by block sharding (SURVEY.md §2.4, §5.7).

Design (scaling-book recipe): one logical mesh axis ``blocks``; batch
tensors are sharded on their leading dimension via NamedSharding; XLA
GSPMD partitions the vmapped kernels with zero communication in the
codec body. The only collectives are the ordered-assembly ones:
an all-gather of per-block compressed lengths and a global exclusive
prefix-sum that assigns every block its output offset (SURVEY.md §2.4
"ordered variable-length gather") — both ride ICI within a slice.

Multi-host: the same code runs under ``jax.distributed.initialize``
with a global mesh; each host feeds its addressable shards and the
length prefix-sum provides the global assembly order (no data
reshuffling — compressed bytes stay put, offsets travel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from snappier_tpu.ops.decode import decode_block
from snappier_tpu.ops.encode import encode_block

BLOCK_AXIS = "blocks"


def _default_kernel() -> str:
    # One shared backend probe (models.codec.default_kernel): scalar on
    # real TPU pods, scan off-TPU and on the axon tunnel whose remote
    # compiler wedges on shard_map+pallas. Logged once; override with
    # SNAPPIER_KERNEL or the kernel= argument.
    from snappier_tpu.models.codec import default_kernel

    return default_kernel(sharded=True)


def make_mesh(devices=None, n_devices: int | None = None) -> Mesh:
    """1-D mesh over the block (data-parallel) axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices).reshape(-1), (BLOCK_AXIS,))


def _specs(mesh: Mesh):
    batch = NamedSharding(mesh, P(BLOCK_AXIS))
    return batch


@functools.cache
def _sharded_compress_fn(mesh: Mesh, kernel: str):
    batch = _specs(mesh)

    if kernel == "scalar":
        from jax import shard_map

        from snappier_tpu.ops.pallas.scalar_codec import encode_blocks_scalar

        # Pallas kernels are per-device programs: shard the batch axis
        # explicitly so each chip runs its own grid over its blocks.
        encode = shard_map(
            lambda f, l: encode_blocks_scalar(f, l),
            mesh=mesh,
            in_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS)),
            out_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS)),
            check_vma=False,  # pallas_call outputs carry no replication info
        )
    else:
        def encode(frags, lengths):
            return jax.vmap(encode_block)(frags, lengths)

    rep = NamedSharding(mesh, P(None))

    @functools.partial(
        jax.jit,
        in_shardings=(batch, batch),
        out_shardings=(batch, rep, rep),
    )
    def fn(frags, lengths):
        bodies, body_lens = encode(frags, lengths)
        # Ordered-assembly metadata: global exclusive prefix sum of the
        # compressed lengths. Under GSPMD this lowers to an all-gather
        # of the (tiny) length vector + local scan — the "lengths
        # travel, payload stays" pattern from SURVEY.md §2.4. Both the
        # lengths and the offsets come back replicated so every process
        # of a multi-host run holds the complete assembly map while the
        # payload bytes stay sharded where they were produced.
        offsets = jnp.cumsum(body_lens) - body_lens
        return bodies, body_lens, offsets

    return fn


@functools.cache
def _sharded_decompress_fn(mesh: Mesh, out_cap: int, kernel: str):
    batch = _specs(mesh)

    if kernel == "scalar":
        from jax import shard_map

        from snappier_tpu.ops.pallas.scalar_codec import decode_blocks_scalar

        decode = shard_map(
            lambda c, n: decode_blocks_scalar(c, n, out_cap=out_cap),
            mesh=mesh,
            in_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS)),
            out_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS), P(BLOCK_AXIS)),
            check_vma=False,  # pallas_call outputs carry no replication info
        )
    else:
        def decode(comp, comp_lens):
            return jax.vmap(
                lambda c, n: decode_block(c, n, out_cap=out_cap)
            )(comp, comp_lens)

    rep = NamedSharding(mesh, P(None))
    rep0 = NamedSharding(mesh, P())  # replicated scalar

    @functools.partial(
        jax.jit,
        in_shardings=(batch, batch),
        out_shardings=(batch, rep, rep0),
    )
    def fn(comp, comp_lens):
        outs, out_lens, errs = decode(comp, comp_lens)
        # out_lens come back replicated (a tiny all-gather) so every
        # process of a multi-host run holds the complete assembly map
        # while the decoded payload stays sharded where it was produced
        # — the decode mirror of sharded_compress's offsets.
        return outs, out_lens, jnp.max(errs)

    return fn


def sharded_compress(
    frags, lengths, mesh: Mesh | None = None, kernel: str | None = None
):
    """Compress a [B, F] batch of fragments across the mesh.

    B must be a multiple of the mesh size. Returns (bodies, body_lens
    [B], offsets [B]) with bodies batch-sharded and the lengths +
    offsets replicated (the ordered-assembly map every process holds).
    ``kernel``: 'scalar' (Pallas, default on TPU) or 'scan' (portable
    XLA)."""
    mesh = mesh or make_mesh()
    return _sharded_compress_fn(mesh, kernel or _default_kernel())(
        jnp.asarray(frags, jnp.int32), jnp.asarray(lengths, jnp.int32)
    )


def sharded_decompress(
    comp,
    comp_lens,
    out_cap: int,
    mesh: Mesh | None = None,
    kernel: str | None = None,
):
    """Decode a [B, C] batch of blocks across the mesh. Returns
    (outs [B, out_cap] batch-sharded, out_lens [B] replicated,
    max_err scalar replicated)."""
    mesh = mesh or make_mesh()
    return _sharded_decompress_fn(mesh, out_cap, kernel or _default_kernel())(
        jnp.asarray(comp, jnp.int32), jnp.asarray(comp_lens, jnp.int32)
    )


@functools.cache
def _sharded_roundtrip_fn(mesh: Mesh, frag_size: int, kernel: str):
    batch = _specs(mesh)

    if kernel == "scalar":
        from jax import shard_map

        from snappier_tpu.ops.pallas.scalar_codec import (
            decode_blocks_scalar,
            encode_blocks_scalar,
        )

        encode = shard_map(
            lambda f, l: encode_blocks_scalar(f, l),
            mesh=mesh,
            in_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS)),
            out_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS)),
            check_vma=False,
        )
        decode = shard_map(
            lambda c, n: decode_blocks_scalar(c, n, out_cap=frag_size),
            mesh=mesh,
            in_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS)),
            out_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS), P(BLOCK_AXIS)),
            check_vma=False,
        )
    else:
        def encode(frags, lengths):
            return jax.vmap(encode_block)(frags, lengths)

        def decode(comp, comp_lens):
            return jax.vmap(
                lambda c, n: decode_block(c, n, out_cap=frag_size)
            )(comp, comp_lens)

    @functools.partial(
        jax.jit,
        in_shardings=(batch, batch),
        out_shardings=(batch, batch, None, None),
    )
    def fn(frags, lengths):
        bodies, body_lens = encode(frags, lengths)
        offsets = jnp.cumsum(body_lens) - body_lens
        # Re-wrap each body as a standalone block (preamble is supplied
        # by prepending varint on host normally; here synthesize a
        # 3-byte fixed-width varint so the decoder can verify on-device)
        B = bodies.shape[0]
        pre = jnp.stack(
            [
                (lengths & 0x7F) | 0x80,
                ((lengths >> 7) & 0x7F) | 0x80,
                (lengths >> 14) & 0x7F,
            ],
            axis=1,
        )
        blocks = jnp.concatenate([pre, bodies], axis=1)
        # Pad the block width to the 1024-multiple DMA tiling the
        # scalar kernels require (harmless for the scan kernels).
        w = blocks.shape[1]
        wpad = -(-w // 1024) * 1024
        blocks = jnp.concatenate(
            [blocks, jnp.zeros((B, wpad - w), jnp.int32)], axis=1
        )
        outs, out_lens, errs = decode(blocks, body_lens + 3)
        ok = jnp.all(
            jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, outs.shape, 1)
                < lengths[:, None],
                outs == frags,
                True,
            )
        ) & jnp.all(errs == 0) & jnp.all(out_lens == lengths)
        return bodies, body_lens, offsets, ok

    return fn


def sharded_roundtrip_step(
    frags, lengths, mesh: Mesh | None = None, kernel: str | None = None
):
    """Full codec step — compress, ordered-assembly offsets, decompress,
    bit-exactness check — sharded over the mesh. This is the
    "training-step" analog the multichip dry-run exercises.

    ``kernel``: 'scalar' runs the production Pallas kernels under
    shard_map (interpret mode off-TPU); 'scan' (default) the portable
    XLA kernels."""
    mesh = mesh or make_mesh()
    frags = jnp.asarray(frags, jnp.int32)
    return _sharded_roundtrip_fn(
        mesh, frags.shape[1], kernel or _default_kernel()
    )(frags, jnp.asarray(lengths, jnp.int32))
