"""Corruption-mutation fuzz: engine PARITY on accept/reject verdicts.

The corpus fuzz campaigns exercise VALID streams (differential decode)
and `baddata*` covers three historical corruptions — but nothing
systematically checked that the engines agree on which MUTATED streams
are invalid. That gap shipped a real bug in round 4: the Pallas walk's
trimmed validation accepted a 4-extra-byte literal with length field
0xFFFFFFFF (the int32 `rest + 1` wrap) that every other engine
rejects. This suite pins the property: for seeded random mutations of
valid streams (byte flips, truncations, extensions), the scalar Pallas
kernel, the oracle, and the native engine must return the SAME verdict
— and identical bytes whenever they accept.

Verdict comparison is skipped only where the engines' contracts
legitimately differ: a mutated varint claiming more than the device
out_cap is rejected by the kernel as a capacity violation regardless
of stream coherence, so those mutants assert kernel-rejects and skip
the cross-check (reference analog: output-buffer sizing is the
caller's, SnappyDecompressor.cs:509-535).
"""

from __future__ import annotations

import numpy as np
import pytest

from snappier_tpu.format import oracle
from snappier_tpu.format.varint import read_varint
from snappier_tpu.errors import InvalidDataError, SnappyError

OUT_CAP = 8192  # device capacity for this suite (multiple of 1024)
CC = 6144      # compressed slot (covers every mutant below)


def _base_streams():
    """Valid compressed streams with diverse tag mixes."""
    from tests.conftest import load_corpus_file

    rng = np.random.default_rng(404)
    datas = [
        load_corpus_file("html")[:4000],
        load_corpus_file("urls.10K")[:3000],
        b"a" * 3000,                                  # offset-1 runs
        bytes(range(1, 6)) * 500,                     # offset-5 pattern
        rng.integers(0, 256, 2500, np.uint8).tobytes(),  # incompressible
        (b"abcdefgh" * 200 + bytes(500) + b"xyz" * 300),
        b"x",
        b"",
    ]
    return [bytes(oracle.compress(np.frombuffer(d, np.uint8)))
            for d in datas]


def _mutants(streams, n_per=100):
    rng = np.random.default_rng(405)
    out = []
    for s in streams:
        arr = np.frombuffer(s, np.uint8).copy()
        for _ in range(n_per):
            kind = rng.integers(0, 10)
            m = arr.copy()
            if len(m) and kind < 6:  # byte flips (1-3 positions)
                for _ in range(int(rng.integers(1, 4))):
                    i = int(rng.integers(0, len(m)))
                    m[i] ^= int(rng.integers(1, 256))
                mb = m.tobytes()
            elif len(m) and kind < 7:  # truncation
                mb = m.tobytes()[: int(rng.integers(0, len(m)))]
            elif len(m) > 6 and kind < 8:
                # Targeted wide-literal injection: the long-literal tag
                # family (extra-length bytes, incl. the 4-extra 0xFC
                # form whose int32 `rest + 1` wrap shipped a round-4
                # validation bug) with adversarial length fields —
                # random flips rarely synthesize these.
                i = int(rng.integers(1, len(m) - 5))
                m[i] = int(rng.choice([0xF0, 0xF4, 0xF8, 0xFC]))
                field = rng.choice([
                    [0xFF, 0xFF, 0xFF, 0xFF],   # rest + 1 wraps to 0
                    [0xFE, 0xFF, 0xFF, 0x7F],   # ~int32 max
                    [0xFF, 0xFF, 0xFF, 0x7F],   # wraps negative
                    [0x00, 0x00, 0x80, 0x00],   # 8 MiB claim
                    list(rng.integers(0, 256, 4)),
                ])
                m[i + 1 : i + 5] = np.asarray(field, np.uint8)
                mb = m.tobytes()
            else:  # extension with random tail
                tail = rng.integers(0, 256,
                                    int(rng.integers(1, 40)),
                                    np.uint8).tobytes()
                mb = m.tobytes() + tail
            if len(mb) <= CC:
                out.append(mb)
        # Coherent wide-literal INSERTION: a 5-byte long-literal group
        # spliced in right after the varint, leaving the original tag
        # stream intact behind it. If a bogus length field ever parses
        # as a no-op or a wrong small length (the round-4 int32-wrap
        # bug's signature), the rest of the stream still decodes
        # cleanly and the engines' verdicts DIVERGE — random in-place
        # flips can't produce this shape because they break coherence
        # downstream, masking the divergence as agreed rejection.
        if len(s) > 1:
            try:
                _, tag0 = read_varint(np.frombuffer(s, np.uint8))
            except Exception:
                tag0 = 1
            for field in ([0xFF, 0xFF, 0xFF, 0xFF],
                          [0xFE, 0xFF, 0xFF, 0x7F],
                          [0xFF, 0xFF, 0xFF, 0x7F],
                          [0x00, 0x00, 0x80, 0x00],
                          [0x3B, 0x00, 0x00, 0x00]):
                mb = (s[:tag0] + bytes([0xFC] + field) + s[tag0:])
                if len(mb) <= CC:
                    out.append(mb)
    return out


def _oracle_verdict(mb):
    try:
        return True, bytes(oracle.decompress(np.frombuffer(mb, np.uint8)))
    except (SnappyError, InvalidDataError):
        return False, b""


@pytest.mark.slow
def test_mutation_verdict_parity_scalar_vs_oracle():
    import jax.numpy as jnp

    from snappier_tpu.ops.pallas.scalar_codec import decode_blocks_scalar

    streams = _base_streams()
    mutants = _mutants(streams)
    assert len(mutants) >= 700

    comp = np.zeros((len(mutants), CC), np.int32)
    lens = np.zeros(len(mutants), np.int32)
    for i, mb in enumerate(mutants):
        comp[i, : len(mb)] = np.frombuffer(mb, np.uint8)
        lens[i] = len(mb)
    out, olens, errs = decode_blocks_scalar(
        jnp.asarray(comp), jnp.asarray(lens), out_cap=OUT_CAP,
        interpret=True,
    )
    out_h = np.asarray(out, np.uint8)
    olens_h, errs_h = np.asarray(olens), np.asarray(errs)

    from snappier_tpu.runtime import native

    have_native = native.available()
    checked = accepted = capped = 0
    for i, mb in enumerate(mutants):
        # Capacity-contract divergence: claims past out_cap are the
        # kernel's caller-sizing rejection, not a stream verdict.
        try:
            claim, _ = read_varint(np.frombuffer(mb, np.uint8))
        except (SnappyError, InvalidDataError, Exception):
            claim = None
        if claim is not None and claim > OUT_CAP:
            assert errs_h[i] != 0, i
            capped += 1
            continue
        ok, body = _oracle_verdict(mb)
        checked += 1
        if ok:
            accepted += 1
            assert errs_h[i] == 0, (
                f"mutant {i}: oracle accepts, kernel err={errs_h[i]}"
            )
            assert olens_h[i] == len(body), i
            assert out_h[i, : len(body)].tobytes() == body, i
        else:
            assert errs_h[i] != 0, (
                f"mutant {i}: oracle rejects, kernel accepted "
                f"{olens_h[i]} bytes — validation divergence"
            )
        if have_native:
            try:
                nb = native.decompress(mb)
                nok = True
            except (SnappyError, InvalidDataError):
                nok = False
                nb = b""
            assert nok == ok, f"mutant {i}: native/oracle verdicts differ"
            if nok:
                assert nb == body, i
    # The campaign must actually exercise both verdict classes.
    assert checked >= 500 and accepted >= 20, (checked, accepted, capped)


@pytest.mark.slow
def test_mutation_verdict_parity_scan_vs_oracle():
    """The same mutant corpus against the portable XLA parallel-scan
    decoder (ops/decode.py) — an independent validation implementation
    that can diverge independently of the Pallas walk."""
    import jax
    import jax.numpy as jnp

    from snappier_tpu.ops.decode import decode_block

    mutants = _mutants(_base_streams())
    comp = np.zeros((len(mutants), CC), np.int32)
    lens = np.zeros(len(mutants), np.int32)
    for i, mb in enumerate(mutants):
        comp[i, : len(mb)] = np.frombuffer(mb, np.uint8)
        lens[i] = len(mb)
    out, olens, errs = jax.vmap(
        lambda c, l: decode_block(c, l, OUT_CAP)
    )(jnp.asarray(comp), jnp.asarray(lens))
    out_h = np.asarray(out, np.uint8)
    olens_h, errs_h = np.asarray(olens), np.asarray(errs)

    checked = accepted = 0
    for i, mb in enumerate(mutants):
        try:
            claim, _ = read_varint(np.frombuffer(mb, np.uint8))
        except Exception:
            claim = None
        if claim is not None and claim > OUT_CAP:
            assert errs_h[i] != 0, i
            continue
        ok, body = _oracle_verdict(mb)
        checked += 1
        if ok:
            accepted += 1
            assert errs_h[i] == 0, (
                f"mutant {i}: oracle accepts, scan err={errs_h[i]}"
            )
            assert olens_h[i] == len(body), i
            assert out_h[i, : len(body)].tobytes() == body, i
        else:
            assert errs_h[i] != 0, (
                f"mutant {i}: oracle rejects, scan accepted"
            )
    assert checked >= 500 and accepted >= 20, (checked, accepted)


@pytest.mark.slow
def test_mutation_verdict_parity_incremental_vs_oracle():
    """The byte-split incremental machine (runtime/incremental.py
    BlockDecompressor — the SnappyDecompressor streaming-contract
    analog) against the same mutant corpus: fed at random split
    points, it must return the oracle's verdict and identical bytes on
    accept (round-5: the one decode engine the mutation net did not
    yet adjudicate; the incremental test file covers only VALID
    streams at splits)."""
    from snappier_tpu.runtime.incremental import BlockDecompressor

    rng = np.random.default_rng(406)
    mutants = _mutants(_base_streams(), n_per=40)
    checked = accepted = 0
    for i, mb in enumerate(mutants):
        ok, body = _oracle_verdict(mb)
        d = BlockDecompressor()
        cuts = sorted(
            int(rng.integers(0, len(mb) + 1))
            for _ in range(int(rng.integers(1, 4)))
        )
        try:
            prev = 0
            for c in cuts + [len(mb)]:
                d.decompress(mb[prev:c])
                prev = c
            d.finish()
            got = d.extract_data()
            iok = True
        except (SnappyError, InvalidDataError):
            iok, got = False, b""
        checked += 1
        if ok:
            accepted += 1
            assert iok, (
                f"mutant {i}: oracle accepts, incremental rejects"
            )
            assert got == body, f"mutant {i}: byte divergence"
        else:
            assert not iok, (
                f"mutant {i}: oracle rejects, incremental accepted "
                f"{len(got)} bytes — validation divergence"
            )
    assert checked >= 300 and accepted >= 10, (checked, accepted)
