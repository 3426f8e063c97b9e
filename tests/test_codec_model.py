"""Flagship pipeline tests (models/codec.py) and the distributed
driver, on the CPU mesh."""

import numpy as np
import jax.numpy as jnp
import pytest

import jax

from snappier_tpu.format import oracle
from snappier_tpu.models.codec import SnappyCodec
from snappier_tpu.parallel.distributed import compress_corpus_sharded
from snappier_tpu.parallel.mesh import make_mesh
from snappier_tpu.runtime.stream import SnappyStream
from snappier_tpu.format.varint import write_varint
from tests.conftest import load_corpus_file

F = 2048


def _batch(datas):
    B = len(datas)
    frags = np.zeros((B, F), np.int32)
    lens = np.zeros(B, np.int32)
    for i, d in enumerate(datas):
        a = np.frombuffer(d, np.uint8)
        frags[i, : len(a)] = a
        lens[i] = len(a)
    return jnp.asarray(frags), jnp.asarray(lens)


def test_roundtrip_step():
    codec = SnappyCodec(fragment_size=F, kernel="scan")
    datas = [b"roundtrip me " * 100, bytes(F), b"x" * 777 + b"y" * 100]
    frags, lens = _batch(datas)
    bodies, body_lens, crcs, ok = codec.roundtrip_step(frags, lens)
    assert bool(ok)
    # CRCs match the host implementation
    from snappier_tpu.format.crc32c import crc32c

    crcs = np.asarray(crcs).view(np.uint32)
    for i, d in enumerate(datas):
        assert int(crcs[i]) == crc32c(d), i


def test_compress_batch_bodies_decode():
    codec = SnappyCodec(fragment_size=F, kernel="scan", with_crc=False)
    datas = [load_corpus_file("html")[:F], b"ab" * (F // 2)]
    frags, lens = _batch(datas)
    bodies, body_lens, _ = codec.compress_batch(frags, lens)
    bodies = np.asarray(bodies)
    body_lens = np.asarray(body_lens)
    for i, d in enumerate(datas):
        comp = write_varint(len(d)) + bytes(
            bodies[i, : body_lens[i]].astype(np.uint8)
        )
        assert oracle.decompress(comp) == d, i


def test_compress_corpus_sharded_driver():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(jax.devices()[:8])
    data = load_corpus_file("alice29.txt")  # > 2 fragments
    payload, meta = compress_corpus_sharded(data, mesh=mesh)
    assert oracle.decompress(payload) == data
    assert meta["uncompressed_length"] == len(data)
    offs = meta["block_offsets"]
    lens = meta["block_lengths"]
    assert (np.diff(offs) == lens[:-1]).all()


def test_snappy_stream_factory(tmp_path):
    import io

    data = b"factory mode " * 500
    sink = io.BytesIO()
    with SnappyStream(sink, "wb", leave_open=True) as w:
        w.write(data)
    with SnappyStream(io.BytesIO(sink.getvalue()), "rb") as r:
        assert r.read() == data
    with pytest.raises(ValueError):
        SnappyStream(io.BytesIO(), "a+")


def test_default_kernel_unified(monkeypatch):
    """Round-2 review: mesh and codec answered 'which kernel' two
    different ways. One shared probe now serves both, with an env
    override and a logged choice."""
    from snappier_tpu.models import codec as C
    from snappier_tpu.parallel import mesh

    C.default_kernel.cache_clear()
    try:
        monkeypatch.setenv("SNAPPIER_KERNEL", "scalar")
        assert C.default_kernel() == "scalar"
        assert mesh._default_kernel() == "scalar"
        C.default_kernel.cache_clear()
        monkeypatch.delenv("SNAPPIER_KERNEL")
        # Hermetic CPU backend: portable kernels on both paths.
        assert C.default_kernel() == "scan"
        assert C.default_kernel(sharded=True) == "scan"
        assert C._default_kernel() == mesh._default_kernel()
    finally:
        C.default_kernel.cache_clear()
