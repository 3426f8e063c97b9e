"""Exhaustive tag-byte sweep: spec coverage the random nets can't give.

Every one of the 256 tag bytes (all literal forms incl. the 1-4
extra-length-byte variants, every copy1/copy2/copy4 length encoding)
is planted after a fixed 8-byte literal prefix with systematic
extra-field patterns, payload sizes, and length-preamble claims. The
oracle is the arbiter: for each synthesized stream the scalar Pallas
kernel must return the same accept/reject verdict and identical bytes
on accept. This is the enumerated complement to the randomized
mutation-parity net (tests/test_mutation_parity.py) — CharTable-law
coverage in the reference's spirit (Constants.cs:29-76) without
trusting any single decoder's reading of it.
"""

from __future__ import annotations

import numpy as np
import pytest

from snappier_tpu.errors import InvalidDataError, SnappyError
from snappier_tpu.format import oracle
from snappier_tpu.format.varint import write_varint

OUT_CAP = 2048
CC = 1024

#: 8-byte literal prefix: gives copies a real window (op = 8) so
#: offsets 1..8 are legal and 9 is the first out-of-range value.
_PREFIX = bytes([(8 - 1) << 2]) + b"abcdefgh"

#: Extra-field byte patterns (consumed as length bytes, offset bytes,
#: or payload depending on the tag class — the sweep does not assume
#: which): zeros, small, offset-8-ish, max, sign-bit probes.
_FIELDS = [
    bytes([0x00, 0x00, 0x00, 0x00]),
    bytes([0x01, 0x00, 0x00, 0x00]),
    bytes([0x04, 0x00, 0x00, 0x00]),
    bytes([0x08, 0x00, 0x00, 0x00]),
    bytes([0x09, 0x00, 0x00, 0x00]),
    bytes([0x30, 0x00, 0x00, 0x00]),
    bytes([0xFF, 0xFF, 0xFF, 0xFF]),
    bytes([0xFF, 0xFF, 0xFF, 0x7F]),
]

_PAYLOAD = b"0123456789" * 8  # trailing bytes a literal may consume


def _coherent_output_len(body: bytes) -> int | None:
    """Structural walk with NO claim: total decoded length if the tag
    chain consumes the body exactly with in-range copies, else None.
    Used only to synthesize the matching preamble claim — validity is
    still adjudicated by the oracle, so a bug here can only reduce the
    number of accepted sweep points, never hide a divergence."""
    i, op = 0, 0
    n = len(body)
    while i < n:
        t = body[i]
        tt = t & 3
        if tt == 0:
            l6 = t >> 2
            if l6 < 60:
                hdr, ln = 1, l6 + 1
            else:
                e = l6 - 59
                if i + 1 + e > n:
                    return None
                ln = int.from_bytes(body[i + 1 : i + 1 + e], "little") + 1
                hdr = 1 + e
            if i + hdr + ln > n or ln > OUT_CAP:
                return None
            i += hdr + ln
            op += ln
        else:
            if tt == 1:
                hdr, ln = 2, ((t >> 2) & 7) + 4
                if i + 2 > n:
                    return None
                off = ((t >> 5) << 8) | body[i + 1]
            elif tt == 2:
                hdr, ln = 3, (t >> 2) + 1
                if i + 3 > n:
                    return None
                off = int.from_bytes(body[i + 1 : i + 3], "little")
            else:
                hdr, ln = 5, (t >> 2) + 1
                if i + 5 > n:
                    return None
                off = int.from_bytes(body[i + 1 : i + 5], "little")
            if off <= 0 or off > op:
                return None
            i += hdr
            op += ln
        if op > OUT_CAP:
            return None
    return op


def _streams():
    out = []
    for t in range(256):
        for f in _FIELDS:
            for pay in (0, 12, 64):
                body = _PREFIX + bytes([t]) + f + _PAYLOAD[:pay]
                # Claims: too small, prefix-only, a plausible mid
                # value, generous (tests length-mismatch + bounds
                # rejection in both directions) — plus the EXACT
                # structural total when the body is coherent, so every
                # decodable tag form contributes accepted points.
                claims = [8, 9, 21, 8 + 64 + len(f) + pay]
                exact = _coherent_output_len(body)
                if exact is not None:
                    claims.append(exact)
                for claim in claims:
                    s = write_varint(claim) + body
                    if len(s) <= CC:
                        out.append(s)
    return out


@pytest.mark.slow
def test_tag_sweep_verdict_parity():
    import jax.numpy as jnp

    from snappier_tpu.ops.pallas.scalar_codec import decode_blocks_scalar

    streams = _streams()
    comp = np.zeros((len(streams), CC), np.int32)
    lens = np.zeros(len(streams), np.int32)
    for i, s in enumerate(streams):
        comp[i, : len(s)] = np.frombuffer(s, np.uint8)
        lens[i] = len(s)
    out, olens, errs = decode_blocks_scalar(
        jnp.asarray(comp), jnp.asarray(lens), out_cap=OUT_CAP,
        interpret=True,
    )
    out_h = np.asarray(out, np.uint8)
    olens_h, errs_h = np.asarray(olens), np.asarray(errs)

    from snappier_tpu.runtime import native

    have_native = native.available()
    accepted = 0
    for i, s in enumerate(streams):
        try:
            body = bytes(oracle.decompress(np.frombuffer(s, np.uint8)))
            ok = True
        except (SnappyError, InvalidDataError):
            ok = False
            body = b""
        if ok:
            accepted += 1
            assert errs_h[i] == 0, (
                f"stream {i}: oracle accepts, kernel err={errs_h[i]}"
            )
            assert olens_h[i] == len(body), i
            assert out_h[i, : len(body)].tobytes() == body, i
        else:
            assert errs_h[i] != 0, (
                f"stream {i}: oracle rejects, kernel accepted"
                f" {olens_h[i]} bytes"
            )
        if have_native:
            try:
                nb = native.decompress(s)
                nok = True
            except (SnappyError, InvalidDataError):
                nok = False
                nb = b""
            assert nok == ok, (
                f"stream {i}: native/oracle verdicts differ"
            )
            if nok:
                assert nb == body, i
    # Every tag class must contribute some accepted streams: copy1,
    # copy2, copy4, short literals, and each long-literal width.
    assert accepted >= 300, accepted


@pytest.mark.slow
def test_tag_sweep_verdict_parity_scan_engine():
    """The same sweep against the OTHER device decoder family (the
    portable XLA parallel-scan engine, ops/decode.py) — its validation
    is an independent implementation and can diverge independently."""
    import jax
    import jax.numpy as jnp

    from snappier_tpu.ops.decode import decode_block

    streams = _streams()
    comp = np.zeros((len(streams), CC), np.int32)
    lens = np.zeros(len(streams), np.int32)
    for i, s in enumerate(streams):
        comp[i, : len(s)] = np.frombuffer(s, np.uint8)
        lens[i] = len(s)
    out, olens, errs = jax.vmap(
        lambda c, l: decode_block(c, l, OUT_CAP)
    )(jnp.asarray(comp), jnp.asarray(lens))
    out_h = np.asarray(out, np.uint8)
    olens_h, errs_h = np.asarray(olens), np.asarray(errs)

    accepted = 0
    for i, s in enumerate(streams):
        try:
            body = bytes(oracle.decompress(np.frombuffer(s, np.uint8)))
            ok = True
        except (SnappyError, InvalidDataError):
            ok = False
            body = b""
        if ok:
            accepted += 1
            assert errs_h[i] == 0, (
                f"stream {i}: oracle accepts, scan err={errs_h[i]}"
            )
            assert olens_h[i] == len(body), i
            assert out_h[i, : len(body)].tobytes() == body, i
        else:
            assert errs_h[i] != 0, (
                f"stream {i}: oracle rejects, scan accepted"
                f" {olens_h[i]} bytes"
            )
    assert accepted >= 300, accepted
