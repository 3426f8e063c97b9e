"""Multi-host driver: global-mesh codec over a pod slice.

The reference has no distributed layer (SURVEY.md §2.4); this is the
framework's scale-out story for the BASELINE 10 GB corpus config:

* each host feeds only its addressable shard of the block batch;
* the codec body is communication-free (block independence);
* ordered assembly needs only the per-block compressed-length vector,
  which is all-gathered (tiny) and prefix-summed so every host knows
  every block's byte offset in the final stream;
* compressed payload bytes never move between hosts — each host writes
  its shard at its offsets (e.g., into a shared filestore or via a
  final ICI/DCN gather when a single buffer is required).

Testable without a pod: the same code runs on the 8-virtual-device CPU
mesh (tests/test_parallel.py); ``initialize`` is a thin wrapper over
``jax.distributed.initialize``.
"""

from __future__ import annotations

import numpy as np

import jax

from snappier_tpu.constants import BLOCK_SIZE
from snappier_tpu.errors import InvalidDataError
from snappier_tpu.format.varint import write_varint
from snappier_tpu.parallel.mesh import (
    BLOCK_AXIS,
    make_mesh,
    sharded_compress,
    sharded_decompress,
)


def initialize(coordinator_address: str | None = None, **kw) -> None:
    """Join the multi-host runtime (call once per process, before any
    device computation). No-op when running single-process."""
    if coordinator_address is None and jax.process_count() == 1:
        return
    jax.distributed.initialize(coordinator_address, **kw)


def _global_batch(arr: np.ndarray, mesh):
    """Wrap a host NumPy batch as a global jax.Array sharded on the
    block axis. In a multi-process run a plain NumPy argument cannot
    span non-addressable devices; the callback form materializes only
    this process's shards (every process holds the same full corpus
    here, so any index is servable)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(*([BLOCK_AXIS] + [None] * (arr.ndim - 1))))
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx]
    )


def compress_corpus_sharded(data: bytes, mesh=None, kernel: str | None = None):
    """Compress an arbitrarily large buffer data-parallel over the mesh.

    Splits into 64 KiB fragments, pads the batch to the mesh size,
    compresses sharded, and returns ``(payload, meta)`` where payload
    is the full block-format bytes (host-assembled in order using the
    replicated offsets) and meta carries per-block lengths/offsets for
    zero-copy scatter writes on multi-host deployments.

    On a multi-host run each host only materializes its addressable
    shard of ``bodies``; the offsets vector is identical everywhere, so
    hosts can write disjoint byte ranges of the output independently:
    the returned ``payload`` holds bytes only at this process's blocks
    (``meta["local_blocks"]``, zeros elsewhere) and the union of all
    processes' payloads is the complete stream.
    """
    mesh = mesh or make_mesh()
    nd = int(np.prod(list(mesh.shape.values())))
    arr = np.frombuffer(bytes(data), np.uint8)
    n = len(arr)
    nfrags = max(1, -(-n // BLOCK_SIZE))
    b = -(-nfrags // nd) * nd  # pad batch to mesh multiple
    frags = np.zeros((b, BLOCK_SIZE), np.int32)
    lengths = np.zeros(b, np.int32)
    for i in range(nfrags):
        frag = arr[i * BLOCK_SIZE : (i + 1) * BLOCK_SIZE]
        frags[i, : len(frag)] = frag
        lengths[i] = len(frag)

    multiproc = jax.process_count() > 1
    if multiproc:
        frags_in = _global_batch(frags, mesh)
        lengths_in = _global_batch(lengths, mesh)
    else:
        frags_in, lengths_in = frags, lengths
    bodies, body_lens, offsets = sharded_compress(
        frags_in, lengths_in, mesh=mesh, kernel=kernel
    )
    # Lengths and offsets are replicated — every process holds the full
    # assembly map; payload bytes stay on the devices that produced
    # them and each process writes only its addressable blocks.
    body_lens = np.asarray(body_lens)
    offsets = np.asarray(offsets)

    preamble = write_varint(n)
    total = int(offsets[nfrags - 1] + body_lens[nfrags - 1]) if nfrags else 0
    payload = bytearray(len(preamble) + total)
    payload[: len(preamble)] = preamble
    base = len(preamble)
    local_blocks: list[int] = []
    if multiproc:
        for shard in bodies.addressable_shards:
            rows = range(*shard.index[0].indices(b))
            data = np.asarray(shard.data)
            for j, i in enumerate(rows):
                if i >= nfrags:
                    continue
                local_blocks.append(i)
                o = base + int(offsets[i])
                payload[o : o + int(body_lens[i])] = (
                    data[j, : int(body_lens[i])].astype(np.uint8).tobytes()
                )
        local_blocks.sort()
    else:
        bodies_np = np.asarray(bodies)
        local_blocks = list(range(nfrags))
        for i in range(nfrags):
            o = base + int(offsets[i])
            payload[o : o + int(body_lens[i])] = (
                bodies_np[i, : int(body_lens[i])].astype(np.uint8).tobytes()
            )
    meta = {
        "uncompressed_length": n,
        "block_lengths": body_lens[:nfrags],
        "block_offsets": offsets[:nfrags] + base,
        "local_blocks": local_blocks,
    }
    return bytes(payload), meta


def decompress_corpus_sharded(
    data: bytes,
    mesh=None,
    kernel: str | None = None,
    fragment_size: int = BLOCK_SIZE,
):
    """Decode an arbitrarily large block-format buffer data-parallel
    over the mesh — the decode twin of :func:`compress_corpus_sharded`
    (round-5 verdict item 2; the reference decodes any size through one
    serial lookback buffer, SnappyDecompressor.cs:43-184 — this is its
    replacement at pod scale).

    Pipeline: host prescan splits the tag stream at exact 64 KiB
    *output* boundaries (runtime/prescan.py; GB/s in the native
    scanner) → each fragment re-wrapped as a standalone block → batch
    padded to the mesh multiple → ``sharded_decompress`` over the block
    axis (zero codec-body communication) → ordered assembly from the
    replicated out_lens map, each host writing only its addressable
    fragments' byte ranges.

    Returns ``(plain, meta)``: the decoded bytes (in a multi-process
    run, bytes only at this process's fragments — zeros elsewhere; the
    union across processes is the complete output) and the assembly
    map (per-fragment lengths/offsets + this process's fragment
    indices).

    Window-crossing streams (legal per the wire format, emitted by no
    known encoder) fall back to the serial host decoder on every
    process, exactly as the single-device path does.

    ``fragment_size``: the prescan output line (production BLOCK_SIZE;
    smaller values serve hermetic small-shape mesh tests and the
    multichip dry-run, where the 64 KiB out_cap would compile for
    minutes on a CPU mesh)."""
    from snappier_tpu.runtime import prescan

    mesh = mesh or make_mesh()
    nd = int(np.prod(list(mesh.shape.values())))
    arr = np.frombuffer(bytes(data), np.uint8)
    recs = prescan.scan_fragments(arr, fragment_size)
    if recs is None:
        from snappier_tpu.runtime import block

        plain = block.decompress(
            arr, engine="native" if _native_available() else "oracle"
        )
        meta = {
            "uncompressed_length": len(plain),
            "fragment_lengths": np.array([len(plain)], np.int64),
            "fragment_offsets": np.array([0], np.int64),
            "local_fragments": [0],
            "window_crossing_fallback": True,
        }
        return plain, meta
    comp, comp_lens, out_lens_exp = prescan.assemble_fragment_rows(arr, recs)
    nf = comp.shape[0]
    b = -(-nf // nd) * nd  # pad batch to mesh multiple
    if b > nf:
        pad_rows = np.zeros((b - nf, comp.shape[1]), comp.dtype)
        # A padded row must still be a valid block: a 1-byte varint(0)
        # preamble decodes to zero bytes with no error (all-zero rows
        # with comp_len 0 would trip the decoder's preamble check).
        comp = np.concatenate([comp, pad_rows], axis=0)
        comp_lens = np.concatenate(
            [comp_lens, np.ones(b - nf, np.int32)], axis=0
        )
    multiproc = jax.process_count() > 1
    if multiproc:
        comp_in = _global_batch(comp, mesh)
        comp_lens_in = _global_batch(comp_lens, mesh)
    else:
        comp_in, comp_lens_in = comp, comp_lens
    outs, out_lens, max_err = sharded_decompress(
        comp_in, comp_lens_in, out_cap=fragment_size, mesh=mesh, kernel=kernel
    )
    if int(np.asarray(max_err)):
        from snappier_tpu.runtime.block import _raise_for_err

        _raise_for_err(int(np.asarray(max_err)))
    out_lens = np.asarray(out_lens)  # replicated assembly map
    if not (out_lens[:nf] == np.asarray(out_lens_exp)).all():
        raise InvalidDataError("fragment output length mismatch")
    offsets = np.concatenate([[0], np.cumsum(out_lens[:nf])])
    total = int(offsets[nf])
    plain = bytearray(total)
    local_fragments: list[int] = []
    if multiproc:
        for shard in outs.addressable_shards:
            rows = range(*shard.index[0].indices(b))
            shard_data = np.asarray(shard.data)
            for j, i in enumerate(rows):
                if i >= nf:
                    continue
                local_fragments.append(i)
                o = int(offsets[i])
                plain[o : o + int(out_lens[i])] = (
                    shard_data[j, : int(out_lens[i])]
                    .astype(np.uint8)
                    .tobytes()
                )
        local_fragments.sort()
    else:
        outs_np = np.asarray(outs)
        local_fragments = list(range(nf))
        for i in range(nf):
            o = int(offsets[i])
            plain[o : o + int(out_lens[i])] = (
                outs_np[i, : int(out_lens[i])].astype(np.uint8).tobytes()
            )
    meta = {
        "uncompressed_length": total,
        "fragment_lengths": out_lens[:nf],
        "fragment_offsets": offsets[:nf],
        "local_fragments": local_fragments,
    }
    return bytes(plain), meta


def _native_available() -> bool:
    from snappier_tpu.runtime import native

    return native.available()
