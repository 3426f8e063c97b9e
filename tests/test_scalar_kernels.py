"""Scalar-core Pallas codec tests (interpreter mode on CPU; the same
kernels were validated compiled on a real v5e chip). Tiny fragments
keep interpreter time reasonable."""

import numpy as np
import jax.numpy as jnp
import pytest

from snappier_tpu.format import oracle
from snappier_tpu.format.varint import write_varint
from snappier_tpu.ops.pallas.scalar_codec import (
    decode_blocks_scalar,
    encode_blocks_scalar,
)

F = 1024  # fragment size for tests (multiple of 1024)
CC = 2048


def _enc(datas):
    B = len(datas)
    frags = np.zeros((B, F), np.int32)
    lens = np.zeros(B, np.int32)
    for i, d in enumerate(datas):
        a = np.frombuffer(d, np.uint8)
        frags[i, : len(a)] = a
        lens[i] = len(a)
    bodies, blens = encode_blocks_scalar(jnp.asarray(frags), jnp.asarray(lens))
    return np.asarray(bodies), np.asarray(blens)


def _dec(comps, out_cap=F):
    B = len(comps)
    comp = np.zeros((B, CC), np.int32)
    lens = np.zeros(B, np.int32)
    for i, c in enumerate(comps):
        a = np.frombuffer(c, np.uint8)
        comp[i, : len(a)] = a
        lens[i] = len(a)
    out, olens, errs = decode_blocks_scalar(
        jnp.asarray(comp), jnp.asarray(lens), out_cap=out_cap
    )
    return np.asarray(out), np.asarray(olens), np.asarray(errs)


CASES = [
    b"",
    b"a",
    b"ab" * 50,
    b"a" * 300,
    b"the quick brown snappy " * 20,
    bytes(500),
]


def test_scalar_encode_decodes_on_oracle():
    bodies, blens = _enc(CASES)
    for i, d in enumerate(CASES):
        comp = write_varint(len(d)) + bytes(bodies[i, : blens[i]].astype(np.uint8))
        assert oracle.decompress(comp) == d, i


def test_scalar_decode_matches_oracle():
    comps = [oracle.compress(d) for d in CASES]
    out, olens, errs = _dec(comps)
    for i, d in enumerate(CASES):
        assert errs[i] == 0, (i, errs[i])
        assert bytes(out[i, : olens[i]].astype(np.uint8)) == d, i


def test_scalar_roundtrip_incompressible_and_patterns():
    rng = np.random.default_rng(3)
    datas = [
        rng.integers(0, 256, 1000, np.uint8).tobytes(),
        bytes(range(1, 6)) * 150,  # offset-5 overlap pattern
        b"x" * F,  # full fragment run
    ]
    bodies, blens = _enc(datas)
    comps = [
        write_varint(len(d)) + bytes(bodies[i, : blens[i]].astype(np.uint8))
        for i, d in enumerate(datas)
    ]
    out, olens, errs = _dec(comps)
    for i, d in enumerate(datas):
        assert errs[i] == 0
        assert bytes(out[i, : olens[i]].astype(np.uint8)) == d, i


def test_scalar_decode_rejects_corrupt():
    bad = [
        b"\xff\xff\xff\xff\xff",
        bytes([10, 3 << 2]) + b"ab",
        bytes([4, 1, 1]),
        bytes([1]),
        bytes([3, (4 - 1) << 2]) + b"abcd",
    ]
    _, _, errs = _dec(bad)
    assert (errs != 0).all(), errs


def test_scalar_decode_copy4():
    data = bytes([8, (4 - 1) << 2]) + b"abcd" + bytes([3 | (3 << 2), 4, 0, 0, 0])
    out, olens, errs = _dec([data])
    assert errs[0] == 0
    assert bytes(out[0, : olens[0]].astype(np.uint8)) == b"abcdabcd"


def test_crc32c_blocks_ignores_garbage_tails():
    """Regression: decode kernels over-store garbage words past the
    output frontier; the device CRC must mask bytes past each row's
    length (caught as a CRC mismatch on a 100 MB stream whose final
    chunk was partial)."""
    from snappier_tpu.constants import BLOCK_SIZE
    from snappier_tpu.format.crc32c import crc32c
    from snappier_tpu.ops.pallas.crc32c import crc32c_blocks

    rng = np.random.default_rng(7)
    lens = np.array([0, 1, 57344, BLOCK_SIZE - 3, BLOCK_SIZE], np.int32)
    B = len(lens)
    frags = rng.integers(0, 256, (B, BLOCK_SIZE), dtype=np.int32)
    got = np.asarray(
        crc32c_blocks(jnp.asarray(frags), jnp.asarray(lens))
    ).view(np.uint32)
    for i, l in enumerate(lens):
        want = crc32c(frags[i, :l].astype(np.uint8).tobytes())
        assert int(got[i]) == want, (i, l)


def test_decode_rejects_expected_over_out_cap():
    """Regression (round-3 advisor): the capacity check used the
    DMA-rounded SMEM size (up to ~3 KiB above out_cap), so a block
    claiming 2000 bytes decoded "cleanly" at out_cap=1024 and was
    silently truncated by the host-side slice."""
    comp = oracle.compress(np.frombuffer(b"x" * 2000, np.uint8))
    _, _, errs = _dec([comp], out_cap=1024)
    assert errs[0] != 0


def test_exact_candidates_widest_first():
    """ops.best_match: nearest-previous per width, widest wins, -1
    where nothing matches; never a candidate >= own position."""
    import jax.numpy as jnp

    from snappier_tpu.ops.best_match import exact_candidates

    data = b"abcdefgh" * 8 + b"XYZW" + b"abcdefgh"  # 4+8-wide repeats
    a = np.frombuffer(data, np.uint8).astype(np.int32)
    F = 1024
    frags = np.zeros((1, F), np.int32)
    frags[0, : len(a)] = a
    cand = np.asarray(
        exact_candidates(
            jnp.asarray(frags), jnp.asarray([len(a)], np.int32)
        )
    )[0]
    pos = np.arange(F)
    assert (cand < pos).all()
    # position 8 repeats "abcdefgh" (64-wide history at 8 is absent but
    # 8-wide match at offset 8 exists) -> candidate 0
    assert cand[8] == 0
    # inside the unique "XYZW" run: no candidate at width >= 4
    assert cand[64] == -1 or cand[64] < 64  # 'X' at 64: no prior XYZW
    assert cand[64] == -1
    # the trailing "abcdefgh" sees an earlier occurrence
    assert cand[68] >= 0


def test_best_encoder_repeat_dispatch_batches():
    """Regression (round-3): the sort prepass and the interpreter-mode
    pallas walk fused in ONE XLA:CPU program mis-executed on repeat
    dispatch after a batch-size change ('supplied 2 buffers but
    expected 4'); encode_blocks_best must stay two dispatches."""
    import jax.numpy as jnp

    from snappier_tpu.ops.pallas.scalar_codec import encode_blocks_best

    def mk(B, fill):
        f = np.zeros((B, 1024), np.int32)
        f[:, :1000] = fill
        return jnp.asarray(f), jnp.asarray(np.full(B, 1000, np.int32))

    for B, fill in [(1, 97), (2, 120), (2, 7)]:
        bodies, blens = encode_blocks_best(*mk(B, fill))
        assert int(np.asarray(blens).max()) > 0


def test_scalar_decode_4byte_literal_header():
    """The rare 4-extra-byte literal header (tag 0xFC): legal with a
    small value in 4 LE bytes; a claim past out_cap must reject (the
    round-3 LUT path poisons via the tag's sign bit + byte 4)."""
    ok = bytes([5]) + bytes([0xFC, 4, 0, 0, 0]) + b"abcde"
    out, olens, errs = _dec([ok])
    assert errs[0] == 0 and bytes(out[0, :5].astype(np.uint8)) == b"abcde"
    # length claim with byte 4 nonzero (> 16 MiB) -> reject
    bad = bytes([5]) + bytes([0xFC, 4, 0, 0, 1]) + b"abcde"
    _, _, errs = _dec([bad])
    assert errs[0] != 0


def test_core_parallel_grid_semantics():
    """SNAPPIER_CORE_PARALLEL / core_parallel=True marks the block grid
    ``core_parallel`` so Mosaic splits it across a chip's TensorCores
    (docs/PERF_BUDGET.md path 2 — the ~2x lever on v5p-class megacore
    parts). Blocks are independent and all scratch is core-local, so
    output must be bit-identical; this proves the flagged programs
    trace+compile and agree in interpret mode (this repo's 1-core v5e
    rejects the semantic at Mosaic compile time, so chip validation
    needs multi-core hardware)."""
    datas = [b"core parallel snappy " * 30, bytes(range(256)) * 3]
    frags = np.zeros((2, F), np.int32)
    lens = np.zeros(2, np.int32)
    for i, d in enumerate(datas):
        a = np.frombuffer(d, np.uint8)
        frags[i, : len(a)] = a
        lens[i] = len(a)
    fd, ld = jnp.asarray(frags), jnp.asarray(lens)

    b0, l0 = encode_blocks_scalar(fd, ld, core_parallel=False)
    b1, l1 = encode_blocks_scalar(fd, ld, core_parallel=True)
    assert (np.asarray(l0) == np.asarray(l1)).all()
    assert (np.asarray(b0) == np.asarray(b1)).all()

    comp = np.zeros((2, CC), np.int32)
    clens = np.zeros(2, np.int32)
    for i, d in enumerate(datas):
        blk = write_varint(len(d)) + np.asarray(b0)[i, : int(l0[i])].astype(
            np.uint8
        ).tobytes()
        comp[i, : len(blk)] = np.frombuffer(blk, np.uint8)
        clens[i] = len(blk)
    cd, cl = jnp.asarray(comp), jnp.asarray(clens)
    o0 = decode_blocks_scalar(cd, cl, out_cap=F, core_parallel=False)
    o1 = decode_blocks_scalar(cd, cl, out_cap=F, core_parallel=True)
    for a, b in zip(o0, o1):
        assert (np.asarray(a) == np.asarray(b)).all()
    assert (np.asarray(o0[2]) == 0).all()

    from snappier_tpu.ops.pallas.scalar_codec import encode_blocks_best

    bb0, bl0 = encode_blocks_best(fd, ld, core_parallel=False)
    bb1, bl1 = encode_blocks_best(fd, ld, core_parallel=True)
    assert (np.asarray(bl0) == np.asarray(bl1)).all()
    assert (np.asarray(bb0) == np.asarray(bb1)).all()


def test_scalar_decode_int32_wrap_literal_attack():
    """Adversarial 4-extra-byte literal whose length field is crafted
    so ``op + length``, ``ip + advance``, or the ``rest + 1`` length
    reconstruction wraps int32 — a naive signed bounds check slides
    past those terms: the 0x7FFFFFFF field makes the payload loop
    write ~2^29 words out of SMEM bounds, and the 0xFFFFFFFF field
    wraps the length to 0 and decodes "cleanly" as a 5-byte no-op (a
    stream every other engine rejects — shipped bug caught by the
    round-4 review). The walk's unsigned (length - 1) >= remaining
    compare must reject every such value WITH the walk's own error
    code: the preamble here claims 64 bytes (well under out_cap), so
    a BAD_PREAMBLE rejection would mean the vectors never reached the
    tag walk (this test's first version was vacuous exactly that way,
    claiming 65536 > out_cap)."""
    from snappier_tpu.ops.pallas.scalar_codec import _ERR_MALFORMED

    wraps = [
        bytes([0xFE, 0xFF, 0xFF, 0x7F]),  # length = 0x7FFFFFFF
        bytes([0xFF, 0xFF, 0xFF, 0x7F]),  # length wraps to -0x80000000
        bytes([0xFF, 0xFF, 0xFF, 0xFF]),  # length wraps to 0 (the bug)
        bytes([0x00, 0x00, 0x00, 0x80]),  # negative length field
        bytes([0x00, 0x00, 0x80, 0x00]),  # 8 MiB claim, no wrap
    ]
    bad = [bytes([64]) + bytes([0xFC]) + w + b"x" * 64 for w in wraps]
    _, _, errs = _dec(bad)
    assert (errs == _ERR_MALFORMED).all(), errs
    # Control: the same shape with a small, legal length field decodes.
    ok = bytes([64]) + bytes([0xFC, 63, 0, 0, 0]) + b"y" * 64
    out, olens, errs = _dec([ok])
    assert errs[0] == 0 and olens[0] == 64
    assert bytes(out[0, :64].astype(np.uint8)) == b"y" * 64


def test_scalar_decode_unroll_variants_agree():
    """The walk's unroll factor is pure scheduling: outputs, lengths
    and error words must be identical at every factor, including on
    streams that end mid-backedge (odd/even tag counts) and on
    malformed input (sentinel parking in a neutralized slot)."""
    datas = [b"unroll " * 40, b"z", b"", bytes(range(7)) * 100]
    comps = [oracle.compress(np.frombuffer(d, np.uint8)) for d in datas]
    comps.append(bytes([10, 3 << 2]) + b"ab")  # malformed: truncated
    B = len(comps)
    comp = np.zeros((B, CC), np.int32)
    lens = np.zeros(B, np.int32)
    for i, c in enumerate(comps):
        a = np.frombuffer(bytes(c), np.uint8)
        comp[i, : len(a)] = a
        lens[i] = len(a)
    ref = None
    for unroll in (1, 2, 3):
        out, olens, errs = decode_blocks_scalar(
            jnp.asarray(comp), jnp.asarray(lens), out_cap=F, unroll=unroll
        )
        got = (np.asarray(out), np.asarray(olens), np.asarray(errs))
        if ref is None:
            ref = got
        else:
            for a, b in zip(ref, got):
                assert (a == b).all(), unroll


def test_encoder_epoch_split_guard(monkeypatch):
    """B > _EPOCH_BLOCKS splits into sub-invocations whose outputs are
    identical to the unsplit call (round-5 verdict item 9: epoch-tag
    residues alias grid ranks 32768 apart — the guard bounds it to the
    tolerated cross-invocation staleness class). Exercised with a tiny
    patched threshold; the split path must be bit-identical here since
    interpreter-mode scratch starts zeroed per invocation."""
    import snappier_tpu.ops.pallas.scalar_codec as sc

    rng = np.random.default_rng(11)
    B = 6
    frags = rng.integers(0, 256, (B, F), dtype=np.int32)
    frags[:, F // 2 :] = frags[:, : F // 2]  # some matches
    lens = np.full(B, F, np.int32)

    ref_bodies, ref_lens = sc.encode_blocks_scalar(
        jnp.asarray(frags), jnp.asarray(lens), interpret=True
    )
    monkeypatch.setattr(sc, "_EPOCH_BLOCKS", 2)
    got_bodies, got_lens = sc.encode_blocks_scalar(
        jnp.asarray(frags), jnp.asarray(lens), interpret=True
    )
    assert (np.asarray(got_lens) == np.asarray(ref_lens)).all()
    assert (np.asarray(got_bodies) == np.asarray(ref_bodies)).all()
    # And each split body still decodes bit-exactly on the oracle.
    from snappier_tpu.format import oracle
    from snappier_tpu.format.varint import write_varint

    gb = np.asarray(got_bodies)
    for i in range(B):
        comp = write_varint(F) + gb[i, : int(got_lens[i])].astype(
            np.uint8
        ).tobytes()
        assert oracle.decompress(comp) == frags[i].astype(
            np.uint8
        ).tobytes()


def test_encode_packed_image_matches_unpacked():
    """encode_blocks_scalar(packed=True) returns the kernel's word
    image whose bytes are identical to the unpacked bodies (the fused
    compress graph consumes it directly — round-5 review finding)."""
    rng = np.random.default_rng(23)
    B = 3
    frags = rng.integers(0, 256, (B, F), dtype=np.int32)
    frags[:, ::3] = 65  # some compressibility
    lens = np.array([F, F - 1, F // 2], np.int32)
    from snappier_tpu.ops.pallas.scalar_codec import encode_blocks_scalar

    bodies, blens = encode_blocks_scalar(
        jnp.asarray(frags), jnp.asarray(lens), interpret=True
    )
    packed, blens2 = encode_blocks_scalar(
        jnp.asarray(frags), jnp.asarray(lens), interpret=True, packed=True
    )
    assert (np.asarray(blens) == np.asarray(blens2)).all()
    by = np.asarray(packed).view(np.uint8).reshape(B, -1)
    ref = np.asarray(bodies, np.uint8)
    for i in range(B):
        n = int(np.asarray(blens)[i])
        assert by[i, :n].tobytes() == ref[i, :n].tobytes(), i
