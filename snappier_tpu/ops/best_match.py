"""Exact-nearest multi-width match candidates for ``level="best"``.

The round-2 "best" encoder was the full rank-doubling scan engine —
11-18% denser than the reference's lossy hash table
(HashTable.cs:91-126) but ~30-45 ms/block on its unoptimized XLA
sort/gather pipeline. This module keeps the density at a fraction of
the cost with a measured insight (tools prototype, round 3): greedy
parsing that picks, at each position, the *widest verified* candidate
among "nearest previous position sharing my first w bytes" for a few
widths w matches the rank-doubling engine's ratio exactly on html
(0.2115 vs 0.2119 on the first 64 KiB; picking by true extension
length instead of width changed nothing).

Per width that is ONE row sort + one inverse sort (lax.sort is the one
primitive this TPU runs fast on the 64 KiB scale — ~0.3 ms/row —
versus ~135M elem/s gathers), so five widths cost ~3 ms/block instead
of 45. Width >= 8 uses a 2x32-bit rolling fingerprint; a collision
cannot corrupt output because the scalar kernel verifies the first 4
bytes exactly and *measures* the true match length during extension —
a bogus candidate only costs density, never correctness.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

#: Two independent 32-bit fold multipliers (odd -> bijective per step).
_M1 = jnp.int32(-1640531527)  # 0x9E3779B9
_M2 = jnp.int32(-1028477387)  # 0xC2B2AE35

#: Default width ladder. Measured on chip (round 4): adding 128 gains
#: 20 B on whole html (19650 -> 19630) and 256 changes nothing, so the
#: ladder stops at 128. Overwrites by wider widths are strictly safe
#: for w >= 16: any match of length >= 12 is emitted as 3-byte copy-2
#: tags regardless of offset, so candidate distance cannot change the
#: cost while the guaranteed extension doubles.
DEFAULT_WIDTHS = (4, 8, 16, 32, 64, 128)


def _nearest_prev(hi, lo, valid, pos):
    """Per row: nearest previous position with an equal (hi, lo)
    fingerprint, -1 where none/invalid. Invalid positions get unique
    keys so they never pair with each other."""
    B, F = hi.shape
    big = jnp.int32(0x7F000000)
    hi = jnp.where(valid, hi, big + pos)
    lo = jnp.where(valid, lo, pos)
    posb = jnp.broadcast_to(pos, (B, F))
    sh, sl, sp = jax.lax.sort((hi, lo, posb), dimension=1, num_keys=3)
    same = (sh[:, 1:] == sh[:, :-1]) & (sl[:, 1:] == sl[:, :-1])
    prev = jnp.concatenate(
        [
            jnp.full((B, 1), -1, jnp.int32),
            jnp.where(same, sp[:, :-1], -1),
        ],
        axis=1,
    )
    # Invert the permutation with a second sort (cheaper than scatter
    # on this hardware: sorts ~0.3 ms/row, gathers ~135M elem/s).
    _, cand = jax.lax.sort((sp, prev), dimension=1, num_keys=1)
    return cand


@functools.partial(jax.jit, static_argnames=("widths",))
def exact_candidates(frags, lengths, widths: tuple = DEFAULT_WIDTHS):
    """int32[B, F] byte rows -> int32[B, F] candidate positions.

    cand[b, i] is the nearest j < i whose first-w bytes fingerprint-
    match position i, for the LARGEST w in ``widths`` that has such a
    j; -1 when no width matches. Positions with fewer than w valid
    bytes left (i + w > lengths[b]) don't participate at width w."""
    frags = frags.astype(jnp.int32)
    lengths = lengths.astype(jnp.int32)
    B, F = frags.shape
    pos = jnp.arange(F, dtype=jnp.int32)[None, :]

    pad = jnp.zeros((B, 4), jnp.int32)
    d = jnp.concatenate([frags, pad], axis=1)
    k4 = (
        d[:, 0:F]
        | (d[:, 1 : F + 1] << 8)
        | (d[:, 2 : F + 2] << 16)
        | (d[:, 3 : F + 3] << 24)
    )

    ws = sorted(widths)
    assert ws[0] == 4, "width ladder must start at the exact 4-byte key"
    assert all(w & (w - 1) == 0 for w in ws), (
        f"widths must be powers of two (doubling fingerprints); got {ws}"
    )
    # Doubling fingerprints: fp(2w)[i] = fold(fp(w)[i], fp(w)[i+w]).
    # Base w=4 is the exact key itself (hi) — no collisions at all.
    fps = {4: (k4, k4 * _M2)}
    w = 4
    while w < ws[-1]:
        hi, lo = fps[w]
        hi_s = jnp.roll(hi, -w, axis=1)  # [i+w]; garbage wraps are
        lo_s = jnp.roll(lo, -w, axis=1)  # masked by the validity test
        fps[2 * w] = (hi * _M1 + hi_s, lo * _M2 + lo_s)
        w *= 2

    cand = jnp.full((B, F), -1, jnp.int32)
    for w in ws:  # narrowest first; widest overwrites = wins
        hi, lo = fps[w]
        valid = pos + w <= lengths[:, None]
        cw = _nearest_prev(hi, lo, valid, pos)
        cand = jnp.where(cw >= 0, cw, cand)
    return cand
