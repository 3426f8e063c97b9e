"""Vectorized Snappy block encoder (one 64 KiB fragment per call).

The reference encoder is a byte-serial greedy loop: a lossy 16-bit
hash table probed position-by-position with a skip heuristic
(``SnappyCompressor.CompressFragment``, SnappyCompressor.cs:174-415;
``HashTable.TableEntry``, HashTable.cs:91-126). Compressed *bytes* are
an encoder choice — the contract is that output decodes bit-exactly
and is no larger than the reference's (SURVEY.md §7.1). This encoder
re-derives greedy parsing as data-parallel passes (SURVEY.md §2.3
N1/N2):

1. **Exact match candidates** — the 4-byte little-endian key at every
   position; a stable sort by (key, position) makes each position's
   nearest previous occurrence its left neighbor in sort order. This
   is strictly stronger than the reference's collision-lossy hash
   table, so the parse it feeds is at least as dense.
2. **Match lengths** — extended 4 bytes per step by comparing the
   *key* array at stride 4 (15 gathers ≈ 60 bytes), then refined to
   byte granularity (3 gathers), capped at 64 (the max copy length;
   longer matches re-match at the next token, reproducing the
   reference's repeated-64 emission, SnappyCompressor.cs:516-543).
3. **Greedy cover** — the token chain ``next(p) = p + len(p)`` (match)
   or ``p + 1`` (literal byte) resolved by pointer doubling, exactly
   the greedy parse the reference computes serially.
4. **Emission** — maximal literal runs merged positionally; tag sizes
   (copy-1 vs copy-2 selection per SnappyCompressor.cs:466-505,
   literal extra-length bytes per :436-464) prefix-summed into output
   offsets; bytes materialized by a scatter + running-max cover map,
   one branchless select per output byte.

Output is the fragment *body* (no varint preamble); the runtime
concatenates fragments and prepends the preamble
(SnappyCompressor.cs:34-80 layout).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from snappier_tpu.constants import (
    BLOCK_SIZE,
    MAX_COPY1_LENGTH,
    MAX_COPY1_OFFSET,
    MAX_COPY_LENGTH,
    MAX_SHORT_LITERAL,
    MIN_MATCH_LENGTH,
    TAG_COPY1,
    TAG_COPY2,
    greedy_emit_bound,
)

#: Per-fragment output-slot headroom beyond the fragment size. Greedy
#: emission is provably bounded by ``greedy_emit_bound(n) = n + n//65
#: + 8`` (copies never expand; literal runs add at most 1 extra byte
#: per 65 covered — see constants.py for the derivation), i.e. 66 552
#: bytes for a full 64 KiB fragment. 2048 bytes of headroom covers the
#: bound with ~1 KiB to spare; the runtime additionally hard-fails if
#: an emitted length ever exceeds the slot (runtime/block.py).
FRAGMENT_SLACK = 2048
FRAGMENT_OUT_CAP = BLOCK_SIZE + FRAGMENT_SLACK
assert greedy_emit_bound(BLOCK_SIZE) + 8 < FRAGMENT_OUT_CAP

_KEY_STEPS = 15  # 15 * 4 = 60 bytes of stride-4 extension beyond the seed 4


def _log2_ceil(n: int) -> int:
    return max(1, (n - 1).bit_length())


@jax.jit
def encode_block(data: jnp.ndarray, length: jnp.ndarray):
    """Compress one fragment.

    Args:
      data: int32[F] byte values, zero-padded past ``length``, for any
        static fragment size F <= BLOCK_SIZE (the format's offset
        window; production uses F = BLOCK_SIZE, tests/dry-runs may use
        smaller shapes).
      length: traced scalar, 0 <= length <= F.

    Returns:
      (out, out_len): int32[F + FRAGMENT_SLACK] tag-stream bytes and
      the traced compressed body length.
    """
    (F,) = data.shape
    assert F <= BLOCK_SIZE
    data = data.astype(jnp.int32)
    n = length.astype(jnp.int32)

    pos = jax.lax.broadcasted_iota(jnp.int32, (F, 1), 0)[:, 0]
    dpad = jnp.concatenate([data, jnp.zeros(MAX_COPY_LENGTH + 8, jnp.int32)])

    # --- 1. candidates via rank doubling (widths 4, 8, 16, 32, 64) -------
    # A stable sort by (4-byte key, position) groups equal 4-grams with
    # ascending positions; each position's left neighbor in its group is
    # its nearest previous occurrence. Suffix-array-style rank doubling
    # then builds 8/16/32/64-gram groups from rank *pairs* (4 more small
    # sorts), and each level yields a nearest-previous candidate with a
    # guaranteed match of that width. Taking the candidate from the
    # widest non-empty group dominates the reference's single lossy
    # hash probe (HashTable.cs:91-126) — it can never miss a long match
    # in favor of a nearby short one.
    key = (
        dpad[0:F]
        | (dpad[1 : F + 1] << 8)
        | (dpad[2 : F + 2] << 16)
        | (dpad[3 : F + 3] << 24)
    )
    key_sorted, pos_sorted = jax.lax.sort((key, pos), num_keys=1, is_stable=True)

    def group_candidates(eq_prev, pos_sorted):
        """Per-position nearest previous member of its sort group."""
        cand_sorted = jnp.where(
            eq_prev,
            jnp.concatenate([jnp.zeros(1, jnp.int32), pos_sorted[:-1]]),
            -1,
        )
        return jnp.zeros(F, jnp.int32).at[pos_sorted].set(cand_sorted)

    eq_prev = jnp.concatenate(
        [jnp.zeros(1, jnp.bool_), key_sorted[1:] == key_sorted[:-1]]
    )
    cand_lvl = [group_candidates(eq_prev, pos_sorted)]
    rank_sorted = jnp.cumsum(~eq_prev).astype(jnp.int32)
    rank = jnp.zeros(F, jnp.int32).at[pos_sorted].set(rank_sorted)
    for half in (4, 8, 16, 32):
        tail_rank = jnp.where(
            pos + half < F, rank[jnp.clip(pos + half, 0, F - 1)], -(pos + 2)
        )
        a_s, b_s, pos_sorted = jax.lax.sort(
            (rank, tail_rank, pos), num_keys=2, is_stable=True
        )
        eq_prev = jnp.concatenate(
            [
                jnp.zeros(1, jnp.bool_),
                (a_s[1:] == a_s[:-1]) & (b_s[1:] == b_s[:-1]),
            ]
        )
        cand_lvl.append(group_candidates(eq_prev, pos_sorted))
        rank_sorted = jnp.cumsum(~eq_prev).astype(jnp.int32)
        rank = jnp.zeros(F, jnp.int32).at[pos_sorted].set(rank_sorted)

    # Widest level wins; level k guarantees a 4*2^k-byte match.
    cand = cand_lvl[0]
    for c in cand_lvl[1:]:
        cand = jnp.where(c >= 0, c, cand)

    has_key = pos + MIN_MATCH_LENGTH <= n
    has_match = has_key & (cand >= 0)
    cand = jnp.clip(cand, 0, F - 1)

    # --- 2. match lengths: stride-4 key compares + byte refinement -------
    extend_ok = jnp.ones(F, jnp.bool_)
    base = jnp.full(F, MIN_MATCH_LENGTH, jnp.int32)
    kpad = jnp.concatenate([key, jnp.zeros(MAX_COPY_LENGTH + 8, jnp.int32)])
    for j in range(_KEY_STEPS):
        at = MIN_MATCH_LENGTH + 4 * j
        step_ok = kpad[jnp.clip(pos + at, 0, F - 1)] == kpad[
            jnp.clip(cand + at, 0, F - 1)
        ]
        extend_ok = extend_ok & step_ok
        base = base + jnp.where(extend_ok, 4, 0)
    # Byte-level refinement of the first failing 4-byte step.
    ref_ok = base < MAX_COPY_LENGTH
    for t in range(3):
        step_ok = ref_ok & (
            dpad[jnp.clip(pos + base, 0, F - 1)]
            == dpad[jnp.clip(cand + base, 0, F - 1)]
        )
        base = base + step_ok.astype(jnp.int32)
        ref_ok = step_ok
    mlen = jnp.minimum(jnp.minimum(base, MAX_COPY_LENGTH), n - pos)
    has_match = has_match & (mlen >= MIN_MATCH_LENGTH)
    offset = pos - jnp.where(has_match, cand, 0)
    # Marginal-match rejection: a 4-byte match needing a copy-2 tag
    # saves 1 byte over literal bytes but usually costs a fresh literal
    # tag right after it — net negative inside incompressible regions.
    # (The reference pays the same cost; this is a deliberate ratio
    # improvement, SURVEY.md §7.1 encoder freedom.)
    has_match = has_match & ~(
        (mlen == MIN_MATCH_LENGTH) & (offset >= MAX_COPY1_OFFSET)
    )

    # --- 3. greedy token cover by pointer doubling -----------------------
    sentinel = F
    step = jnp.where(has_match, mlen, 1)
    nxt = jnp.where(pos < n, jnp.minimum(pos + step, n), sentinel)
    nxt = jnp.where(nxt >= n, sentinel, nxt)
    nxt = jnp.concatenate([nxt, jnp.array([sentinel], jnp.int32)])
    reach = (
        jax.lax.broadcasted_iota(jnp.int32, (F + 1, 1), 0)[:, 0] == 0
    ).astype(jnp.int32)

    def doubling_step(_, carry):
        nxt, reach = carry
        reach = reach.at[nxt].max(reach, mode="drop")
        nxt = nxt[nxt]
        return nxt, reach

    _, reach = jax.lax.fori_loop(
        0, _log2_ceil(F + 1), doubling_step, (nxt, reach)
    )
    is_token = (reach[:F] > 0) & (pos < n)
    is_copy = is_token & has_match
    is_lit = is_token & ~has_match

    # --- 4. literal-run merge (positional) -------------------------------
    prev_lit = jnp.concatenate([jnp.zeros(1, jnp.bool_), is_lit[:-1]])
    run_start = is_lit & ~prev_lit
    # Next copy-token position at or after p (reverse running min).
    ncp = jnp.flip(jax.lax.cummin(jnp.flip(jnp.where(is_copy, pos, F))))
    run_len = jnp.minimum(ncp, n) - pos  # valid at run_start positions

    lit_extra = jnp.where(run_len > MAX_SHORT_LITERAL, jnp.where(run_len <= 256, 1, 2), 0)
    size_lit = 1 + lit_extra + run_len
    use_copy1 = (mlen <= MAX_COPY1_LENGTH) & (offset < MAX_COPY1_OFFSET)
    size_copy = jnp.where(use_copy1, 2, 3)
    emit = run_start | is_copy
    size = jnp.where(is_copy, size_copy, jnp.where(run_start, size_lit, 0))

    out_off = jnp.cumsum(size) - size  # exclusive prefix sum
    total = out_off[-1] + size[-1]

    # --- 5. byte materialization -----------------------------------------
    out_cap = F + FRAGMENT_SLACK
    scatter_idx = jnp.where(emit, out_off, out_cap)
    cover = jnp.zeros(out_cap, jnp.int32).at[scatter_idx].max(
        pos + 1, mode="drop"
    )
    cover = jnp.clip(jax.lax.cummax(cover) - 1, 0, F - 1)

    q = jax.lax.broadcasted_iota(jnp.int32, (out_cap, 1), 0)[:, 0]
    j = q - out_off[cover]
    cp = is_copy[cover]
    l = mlen[cover]
    d = offset[cover]
    c1 = use_copy1[cover]
    tag_c1 = TAG_COPY1 | ((l - 4) << 2) | ((d >> 8) << 5)
    tag_c2 = TAG_COPY2 | ((l - 1) << 2)
    v_copy = jnp.where(
        j == 0,
        jnp.where(c1, tag_c1, tag_c2),
        jnp.where(j == 1, d & 0xFF, (d >> 8) & 0xFF),
    )
    L1 = run_len[cover] - 1
    e = lit_extra[cover]
    tag_lit = jnp.where(e == 0, L1 << 2, (59 + e) << 2)
    v_lenbyte = jnp.where(j == 1, L1 & 0xFF, (L1 >> 8) & 0xFF)
    v_data = dpad[jnp.clip(cover + j - 1 - e, 0, F - 1)]
    v_lit = jnp.where(j == 0, tag_lit, jnp.where(j <= e, v_lenbyte, v_data))
    out = jnp.where(q < total, jnp.where(cp, v_copy, v_lit), 0)
    return out, total
