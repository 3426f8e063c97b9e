"""Mesh/sharding tests on the 8-virtual-device CPU mesh — the TPU
analog of the reference CI's hardware matrix (SURVEY.md §4.8)."""

import numpy as np
import pytest

import jax

from snappier_tpu.format import oracle
from snappier_tpu.format.varint import write_varint
from snappier_tpu.parallel.mesh import (
    make_mesh,
    sharded_compress,
    sharded_decompress,
    sharded_roundtrip_step,
)

F = 2048  # small fragments: fast CPU compiles, same code path


def _mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(jax.devices()[:8])


def _make_batch(b=16, seed=0):
    rng = np.random.default_rng(seed)
    text = (b"shard me across the mesh in ordered blocks " * 2000)[: b * F]
    frags = np.frombuffer(text, np.uint8).reshape(b, F).astype(np.int32)
    frags[1::2, : F // 2] = rng.integers(0, 256, (b // 2, F // 2))
    lengths = np.full(b, F, np.int32)
    lengths[-1] = F // 3  # ragged tail
    frags[-1, F // 3 :] = 0
    return frags, lengths


def test_sharded_roundtrip_step():
    mesh = _mesh()
    frags, lengths = _make_batch()
    bodies, body_lens, offsets, ok = sharded_roundtrip_step(
        frags, lengths, mesh=mesh
    )
    assert bool(ok)
    off = np.asarray(offsets)
    bl = np.asarray(body_lens)
    assert (np.diff(off) == bl[:-1]).all() and off[0] == 0


def test_sharded_compress_decodes_on_oracle():
    """Ordered assembly: concatenate shards by offset, verify each
    block decodes bit-exactly on the scalar oracle."""
    mesh = _mesh()
    frags, lengths = _make_batch(seed=3)
    bodies, body_lens, offsets = sharded_compress(frags, lengths, mesh=mesh)
    bodies = np.asarray(bodies)
    body_lens = np.asarray(body_lens)
    for i in range(frags.shape[0]):
        comp = (
            write_varint(int(lengths[i]))
            + bodies[i, : int(body_lens[i])].astype(np.uint8).tobytes()
        )
        expect = frags[i, : int(lengths[i])].astype(np.uint8).tobytes()
        assert oracle.decompress(comp) == expect, i


def test_sharded_decompress():
    mesh = _mesh()
    frags, lengths = _make_batch(seed=5)
    b = frags.shape[0]
    cap = F + 131
    comp = np.zeros((b, cap), np.int32)
    comp_lens = np.zeros(b, np.int32)
    for i in range(b):
        data = frags[i, : int(lengths[i])].astype(np.uint8).tobytes()
        c = np.frombuffer(oracle.compress(data), np.uint8)
        comp[i, : len(c)] = c
        comp_lens[i] = len(c)
    outs, out_lens, max_err = sharded_decompress(comp, comp_lens, F, mesh=mesh)
    assert int(max_err) == 0
    outs = np.asarray(outs)
    assert (np.asarray(out_lens) == lengths).all()
    for i in range(b):
        got = outs[i, : int(lengths[i])]
        assert (got == frags[i, : int(lengths[i])]).all(), i


def test_graft_entry():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    bodies, lens, crcs = fn(*args)
    assert bodies.shape[0] == args[0].shape[0]
    ge.dryrun_multichip(8)
