"""``level="best"`` density contract over the full corpus.

Round-3 verdict: nothing asserted ``best <= fast`` corpus-wide, so
"best" was an unvalidated label (the BASELINE.md table even carried a
stale prototype number for html). This suite pins the contract: the
best-level encoder must produce output no larger than EVERY fast
engine (oracle, native C++, scalar TPU kernel) on all 11 canonical
corpus files, and no larger than the reference's golden anchors
(alice29.snappy, html_x_4.snappy) — the SURVEY §7.1 encoder-freedom
bar. Round trips are verified through an independent engine.

All fragments across all files are encoded as ONE batch so each kernel
compiles exactly once (per-file batch shapes would each recompile).
"""

from __future__ import annotations

import numpy as np
import pytest

from snappier_tpu.constants import BLOCK_SIZE
from snappier_tpu.format import oracle
from snappier_tpu.format.varint import write_varint
from tests.conftest import CORPUS_FILES, GOLDEN_PAIRS, load_corpus_file


def _fragment(data: bytes):
    """Split into 64 KiB fragment rows + lengths (compress() layout,
    SnappyCompressor.cs:40-80 fragment loop)."""
    arr = np.frombuffer(data, np.uint8)
    nfrags = max(1, -(-len(arr) // BLOCK_SIZE))
    frags = np.zeros((nfrags, BLOCK_SIZE), np.int32)
    lengths = np.zeros(nfrags, np.int32)
    for i in range(nfrags):
        frag = arr[i * BLOCK_SIZE : (i + 1) * BLOCK_SIZE]
        frags[i, : len(frag)] = frag
        lengths[i] = len(frag)
    return frags, lengths


@pytest.fixture(scope="module")
def corpus_batch():
    """(file -> (data, fragment slice)) plus the concatenated batch."""
    files = {}
    rows, lens = [], []
    at = 0
    for name in CORPUS_FILES:
        data = load_corpus_file(name)
        frags, lengths = _fragment(data)
        files[name] = (data, slice(at, at + len(lengths)))
        rows.append(frags)
        lens.append(lengths)
        at += len(lengths)
    return files, np.concatenate(rows), np.concatenate(lens)


@pytest.fixture(scope="module")
def kernel_sizes(corpus_batch):
    """Per-file compressed sizes from the best and scalar-fast kernels
    (one batched device call each), plus the assembled best streams."""
    import jax.numpy as jnp

    from snappier_tpu.ops.pallas.scalar_codec import (
        encode_blocks_best,
        encode_blocks_scalar,
    )

    files, frags, lengths = corpus_batch
    fd, ld = jnp.asarray(frags), jnp.asarray(lengths)
    best_bodies, best_lens = encode_blocks_best(fd, ld)
    fast_bodies, fast_lens = encode_blocks_scalar(fd, ld)
    best_bodies = np.asarray(best_bodies, np.uint8)
    best_lens = np.asarray(best_lens)
    fast_lens = np.asarray(fast_lens)

    out = {}
    for name, (data, sl) in files.items():
        stream = bytearray(write_varint(len(data)))
        for i in range(sl.start, sl.stop):
            stream += best_bodies[i, : int(best_lens[i])].tobytes()
        out[name] = {
            "best": int(best_lens[sl].sum()) + len(write_varint(len(data))),
            "fast_scalar": int(fast_lens[sl].sum())
            + len(write_varint(len(data))),
            "best_stream": bytes(stream),
        }
    return out


@pytest.mark.slow
@pytest.mark.parametrize("name", CORPUS_FILES)
def test_best_not_larger_than_any_fast_engine(name, corpus_batch, kernel_sizes):
    files, _, _ = corpus_batch
    data, _ = files[name]
    sizes = kernel_sizes[name]
    best = sizes["best"]

    assert best <= sizes["fast_scalar"], (
        f"{name}: best {best} > scalar-fast {sizes['fast_scalar']}"
    )
    oracle_size = len(oracle.compress(np.frombuffer(data, np.uint8)))
    assert best <= oracle_size, f"{name}: best {best} > oracle {oracle_size}"

    from snappier_tpu.runtime import native

    if native.available():
        native_size = len(native.compress(data))
        assert best <= native_size, (
            f"{name}: best {best} > native {native_size}"
        )


@pytest.mark.slow
@pytest.mark.parametrize("plain,golden", GOLDEN_PAIRS)
def test_best_not_larger_than_reference_golden(plain, golden, kernel_sizes):
    ref = load_corpus_file(golden)
    best = kernel_sizes[plain]["best"]
    assert best <= len(ref), (
        f"{plain}: best {best} > reference golden {len(ref)}"
    )


@pytest.mark.slow
@pytest.mark.parametrize("name", CORPUS_FILES)
def test_best_round_trips_through_independent_engine(
    name, corpus_batch, kernel_sizes
):
    """The density claim is meaningless unless the stream is valid:
    decode each best stream with an engine that shares no code with
    the encoder."""
    files, _, _ = corpus_batch
    data, _ = files[name]
    stream = kernel_sizes[name]["best_stream"]
    assert len(stream) == kernel_sizes[name]["best"]

    from snappier_tpu.runtime import native

    if native.available():
        plain = native.decompress(stream)
    else:
        plain = oracle.decompress(np.frombuffer(stream, np.uint8))
    assert bytes(plain) == data
