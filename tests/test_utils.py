"""Utility-layer tests (ByteArrayPoolMemoryOwner.cs analog)."""

import numpy as np

from snappier_tpu.utils import BufferPool


def test_buffer_pool_reuse():
    pool = BufferPool()
    a = pool.rent((64,), np.int32)
    a[:] = 7
    pool.giveback(a)
    b = pool.rent((64,), np.int32)
    assert b is a
    assert (b == 7).all()  # NOT zeroed by default (hot path)
    pool.giveback(b)
    z = pool.rent((64,), np.int32, zero=True)
    assert z is b and (z == 0).all()  # opt-in zero fill
    c = pool.rent((64,), np.int32)
    assert c is not b
    d = pool.rent((32,), np.int32)
    assert d.shape == (32,)


def test_buffer_pool_is_wired_into_streaming():
    """The pool really backs the stream staging path (it must not
    regress to dead code): a round trip through stream_compress /
    stream_decompress populates the default pool's buckets."""
    from snappier_tpu.runtime.stream import stream_compress, stream_decompress
    from snappier_tpu.utils.pool import default_pool

    default_pool.clear()
    data = bytes(range(256)) * 300
    out = stream_decompress(stream_compress(data, engine="tpu"), engine="tpu")
    assert out == data
    assert any(default_pool._buffers.values())


def test_stream_compress_deterministic_over_dirty_pool():
    """Framed device-path compression must not depend on stale pool
    bytes: the scan encoder hashes key windows past a row's length, so
    the staging path zeroes each written row's tail (review r3 — same
    input once produced 78- vs 76-byte bodies depending on the previous
    pool tenant)."""
    from snappier_tpu.runtime.stream import stream_compress
    from snappier_tpu.utils.pool import default_pool

    default_pool.clear()
    data = (b"determinism over dirty pools " * 49)[:1422]
    first = stream_compress(data, engine="tpu")

    # Dirty every pooled buffer with a worst-case tenant (0xFF runs
    # compress well — a stale tail that leaks into candidate selection
    # shifts the emitted tags), then compress the same data again.
    for bucket in default_pool._buffers.values():
        for buf in bucket:
            buf.view(np.uint8)[...] = 0xFF
    assert stream_compress(data, engine="tpu") == first

    # Decode staging rents from the same pool; garbage past comp_lens
    # must affect neither acceptance nor output bytes.
    from snappier_tpu.runtime.stream import stream_decompress

    assert stream_decompress(first, engine="tpu") == data
    for bucket in default_pool._buffers.values():
        for buf in bucket:
            buf.view(np.uint8)[...] = 0xA5
    assert stream_decompress(first, engine="tpu") == data


def test_decompress_batch_fn_cache_is_call_shape_insensitive():
    """fn(cap) and fn(cap, False) must share one compiled graph."""
    from snappier_tpu.models.codec import SnappyCodec

    codec = SnappyCodec()
    assert codec.decompress_batch_fn(1024) is codec.decompress_batch_fn(
        1024, False
    )


def test_throughput_and_device_trace():
    import pathlib
    import tempfile

    from snappier_tpu.utils.profiling import Throughput, device_trace

    with Throughput(1_000_000) as t:
        sum(range(1000))
    assert t.seconds > 0 and t.gbps > 0
    with tempfile.TemporaryDirectory() as d:
        with device_trace(d):
            import jax.numpy as jnp

            (jnp.arange(8) * 2).sum().block_until_ready()
        assert any(pathlib.Path(d).rglob("*"))  # trace artifacts written


def test_runtime_metrics_opt_in(monkeypatch):
    """SNAPPIER_METRICS accounting (SURVEY §5.5 observability beyond
    the reference's debug-asserts-only stance): disabled by default
    (zero-cost falsy check), accumulates calls/seconds/bytes when on."""
    import snappier_tpu.utils.profiling as prof

    # Disabled: timed_call is a no-op and records nothing.
    prof.metrics_reset()
    monkeypatch.setattr(prof, "_ENABLED", False)
    with prof.timed_call("x", 10):
        pass
    assert prof.metrics_snapshot() == {}

    monkeypatch.setattr(prof, "_ENABLED", True)
    with prof.timed_call("x", 10):
        pass
    with prof.timed_call("x", 30):
        pass
    snap = prof.metrics_snapshot()
    assert snap["x"]["calls"] == 2 and snap["x"]["bytes"] == 40
    assert snap["x"]["seconds"] >= 0 and snap["x"]["MBps"] >= 0
    prof.metrics_reset()
    assert prof.metrics_snapshot() == {}
