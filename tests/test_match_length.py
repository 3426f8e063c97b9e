"""FindMatchLength golden vectors, ported verbatim from the
reference's algorithm-level table (SnappyCompressorTests.cs:10-96 —
itself ported from upstream google/snappy's C++ unit tests).

Each vector is (expected, s1, s2, length): the match length comparing
``s1[i]`` vs ``s2[i]`` for ``i < length``, where s1 and s2 are laid
out consecutively in ONE buffer (s1 + s2 + zero padding so the s2
region spans ``length`` bytes) — so comparisons past ``len(s1)`` read
into the s2 region, the overlapping-copy semantics of LZ extension.

Three implementations are pinned against the table:

1. the NumPy oracle's ``_match_length`` (format/oracle.py),
2. the C++ engine's ``match_length`` via the ``stpu_match_length_test``
   hook (native/snappy_core.cpp),
3. the production Pallas extension walk ``_match_extension`` via
   ``match_extension_probe`` (ops/pallas/scalar_codec.py) — the TPU
   architecture verifies a 4-byte seed at probe time and only then
   extends, so vectors with expected < 4 assert the seed-verification
   predicate rejects instead (the length can never be emitted).
"""

from __future__ import annotations

import numpy as np
import pytest

# (expected, s1, s2, length) — SnappyCompressorTests.cs:11-81 verbatim.
VECTORS = [
    (6, "012345", "012345", 6),
    (11, "01234567abc", "01234567abc", 11),
    # Hit s1_limit in 64-bit loop, find a non-match in single-char loop.
    (9, "01234567abc", "01234567axc", 9),
    # Same, but edge cases.
    (11, "01234567abc!", "01234567abc!", 11),
    (11, "01234567abc!", "01234567abc?", 11),
    # Find non-match at once in first loop.
    (0, "01234567xxxxxxxx", "?1234567xxxxxxxx", 16),
    (1, "01234567xxxxxxxx", "0?234567xxxxxxxx", 16),
    (4, "01234567xxxxxxxx", "01237654xxxxxxxx", 16),
    (7, "01234567xxxxxxxx", "0123456?xxxxxxxx", 16),
    # Find non-match in first loop after one block.
    (8, "abcdefgh01234567xxxxxxxx", "abcdefgh?1234567xxxxxxxx", 24),
    (9, "abcdefgh01234567xxxxxxxx", "abcdefgh0?234567xxxxxxxx", 24),
    (12, "abcdefgh01234567xxxxxxxx", "abcdefgh01237654xxxxxxxx", 24),
    (15, "abcdefgh01234567xxxxxxxx", "abcdefgh0123456?xxxxxxxx", 24),
    # 32-bit version: short matches.
    (0, "01234567", "?1234567", 8),
    (1, "01234567", "0?234567", 8),
    (2, "01234567", "01?34567", 8),
    (3, "01234567", "012?4567", 8),
    (4, "01234567", "0123?567", 8),
    (5, "01234567", "01234?67", 8),
    (6, "01234567", "012345?7", 8),
    (7, "01234567", "0123456?", 8),
    (7, "01234567", "0123456?", 7),
    (7, "01234567!", "0123456??", 7),
    # Hit s1_limit in 32-bit loop, hit s1_limit in single-char loop.
    (10, "xxxxxxabcd", "xxxxxxabcd", 10),
    (10, "xxxxxxabcd?", "xxxxxxabcd?", 10),
    (13, "xxxxxxabcdef", "xxxxxxabcdefx", 13),
    # Same, but edge cases.
    (12, "xxxxxx0123abc!", "xxxxxx0123abc!", 12),
    (12, "xxxxxx0123abc!", "xxxxxx0123abc?", 12),
    # Hit s1_limit in 32-bit loop, find non-match in single-char loop.
    (11, "xxxxxx0123abc", "xxxxxx0123axc", 13),
    # Find non-match at once in first loop.
    (6, "xxxxxx0123xxxxxxxx", "xxxxxx?123xxxxxxxx", 18),
    (7, "xxxxxx0123xxxxxxxx", "xxxxxx0?23xxxxxxxx", 18),
    (8, "xxxxxx0123xxxxxxxx", "xxxxxx0132xxxxxxxx", 18),
    (9, "xxxxxx0123xxxxxxxx", "xxxxxx012?xxxxxxxx", 18),
    # Same, but edge cases.
    (6, "xxxxxx0123", "xxxxxx?123", 10),
    (7, "xxxxxx0123", "xxxxxx0?23", 10),
    (8, "xxxxxx0123", "xxxxxx0132", 10),
    (9, "xxxxxx0123", "xxxxxx012?", 10),
    # Find non-match in first loop after one block.
    (10, "xxxxxxabcd0123xx", "xxxxxxabcd?123xx", 16),
    (11, "xxxxxxabcd0123xx", "xxxxxxabcd0?23xx", 16),
    (12, "xxxxxxabcd0123xx", "xxxxxxabcd0132xx", 16),
    (13, "xxxxxxabcd0123xx", "xxxxxxabcd012?xx", 16),
    # Same, but edge cases.
    (10, "xxxxxxabcd0123", "xxxxxxabcd?123", 14),
    (11, "xxxxxxabcd0123", "xxxxxxabcd0?23", 14),
    (12, "xxxxxxabcd0123", "xxxxxxabcd0132", 14),
    (13, "xxxxxxabcd0123", "xxxxxxabcd012?", 14),
]


def _layout(s1: str, s2: str, length: int):
    """(buffer, at, n): one buffer s1 + s2 + zero pad, the reference
    test's exact memory layout (SnappyCompressorTests.cs:84-86)."""
    pad = max(0, length - len(s2))
    buf = (s1 + s2).encode("ascii") + b"\0" * pad
    return buf, len(s1), len(s1) + length


@pytest.mark.parametrize("expected,s1,s2,length", VECTORS)
def test_oracle_match_length(expected, s1, s2, length):
    from snappier_tpu.format.oracle import _match_length

    buf, at, n = _layout(s1, s2, length)
    arr = np.frombuffer(buf, np.uint8)
    assert _match_length(arr, 0, at, n) == expected


@pytest.mark.parametrize("expected,s1,s2,length", VECTORS)
def test_native_match_length(expected, s1, s2, length):
    from snappier_tpu.runtime import native

    if not native.available():
        pytest.skip("native runtime unavailable")
    buf, at, n = _layout(s1, s2, length)
    assert native.match_length_test(buf, 0, at, n) == expected


def test_scalar_kernel_extension_walk():
    """All >= 4 vectors through the production Pallas extension walk in
    ONE batched probe call (per-vector calls would recompile); < 4
    vectors assert the 4-byte seed verification rejects the pair."""
    import jax.numpy as jnp

    from snappier_tpu.ops.pallas.scalar_codec import match_extension_probe

    rows, ats, ns, expects = [], [], [], []
    for expected, s1, s2, length in VECTORS:
        buf, at, n = _layout(s1, s2, length)
        if expected < 4:
            # The quad-probe / best-walk hit predicate: the 4-byte LE
            # keys at cand and at must be equal before any extension.
            b = np.frombuffer(buf.ljust(at + 4 + 4, b"\0"), np.uint8)
            k = lambda p: int.from_bytes(bytes(b[p : p + 4]), "little")
            assert k(0) != k(at), (s1, s2)
            continue
        row = np.zeros(1024, np.int32)
        row[: len(buf)] = np.frombuffer(buf, np.uint8)
        rows.append(row)
        ats.append(at)
        ns.append(n)
        expects.append(expected)

    got = match_extension_probe(
        jnp.asarray(np.stack(rows)),
        np.asarray(ats, np.int32),
        np.zeros(len(ats), np.int32),
        np.asarray(ns, np.int32),
    )
    got = np.asarray(got)
    for g, e, (at, n) in zip(got, expects, zip(ats, ns)):
        assert int(g) == e, f"walk gave {g}, want {e} (at={at}, n={n})"
