"""Lane-parallel fragment dictionary with recency ranking.

The reference keeps its dictionary physically sorted by ascending distance
from the current position to each entry's last use, re-sorting after every
event (dict.c:132-146).  Because stream positions strictly increase and at
most one entry's ``last_pos`` changes per event, all sort keys are distinct
and the re-sort is exactly a *move-to-front* of the touched entry.  This
module exploits that: entries are stored by insertion slot (slot == tag,
dict.c:100), and the recency order lives in a pair of permutation arrays
(``rank_of`` tag->rank, ``tag_of`` rank->tag) updated with O(D) vector ops
instead of a sort.

The longest-prefix probe (dict.c:105-130) is a dense [L, D, 32] byte
comparison; the longest match is unique (entries are distinct strings), so
argmax needs no tie-break.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from x3tpu.config import MAX_MATCH_LEN

I32 = jnp.int32
U8 = jnp.uint8


class DictState(NamedTuple):
    strs: jax.Array     # u8 [L, D, 32] — fragment bytes by insertion slot
    lens: jax.Array     # i32 [L, D]
    n: jax.Array        # i32 [L] — number of entries
    rank_of: jax.Array  # i32 [L, D] — tag -> recency rank
    tag_of: jax.Array   # i32 [L, D] — recency rank -> tag
    overflow: jax.Array  # bool [L]


def dict_init(lanes: int, cap: int) -> DictState:
    return DictState(
        strs=jnp.zeros((lanes, cap, MAX_MATCH_LEN), U8),
        lens=jnp.zeros((lanes, cap), I32),
        n=jnp.zeros((lanes,), I32),
        rank_of=jnp.zeros((lanes, cap), I32),
        tag_of=jnp.zeros((lanes, cap), I32),
        overflow=jnp.zeros((lanes,), jnp.bool_),
    )


def dict_probe(
    d: DictState, target: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Longest-prefix probe of ``target`` [L, 32] against all entries.

    Returns (found [L]b, slot [L]i — the matching entry's tag, best_len [L]i,
    matchlen [L, D]i — per-entry shared-prefix length, reused for the exact-
    duplicate query dict_query_elem, dict.c:148-157).
    """
    lanes, cap, _ = d.strs.shape
    eq = d.strs == target[:, None, :]                      # [L, D, 32]
    mism = ~eq
    first_mism = jnp.argmax(mism, axis=2).astype(I32)      # 0 if all-equal
    matchlen = jnp.where(jnp.any(mism, axis=2), first_mism, MAX_MATCH_LEN)
    valid = jnp.arange(cap, dtype=I32)[None, :] < d.n[:, None]
    ok = valid & (d.lens > 0) & (matchlen >= d.lens)
    cand = jnp.where(ok, d.lens, 0)
    best_len = jnp.max(cand, axis=1)
    slot = jnp.argmax(cand, axis=1).astype(I32)
    return best_len > 0, slot, best_len, matchlen


def dict_probe_len(d: DictState, target: jax.Array) -> jax.Array:
    """Best-match length only (for the magic-factor vetoes,
    backend.c:79-90); 0 when no match."""
    _, _, best_len, _ = dict_probe(d, target)
    return best_len


def dict_has_exact(
    d: DictState, matchlen: jax.Array, frag_len: jax.Array
) -> jax.Array:
    """Whether an entry equals the fragment exactly (same length and bytes),
    given ``matchlen`` from a probe at the fragment's position."""
    lanes, cap = d.lens.shape
    valid = jnp.arange(cap, dtype=I32)[None, :] < d.n[:, None]
    dup = valid & (d.lens == frag_len[:, None]) & (matchlen >= frag_len[:, None])
    return jnp.any(dup, axis=1)


def dict_mtf(d: DictState, tag: jax.Array, active: jax.Array) -> DictState:
    """Move entry ``tag`` to recency rank 0 (== dict_update_costs after a
    hit or insert, dict.c:132-146).  All updates are whole-array transforms
    or drop-mode scatters (no gather+write-back), so XLA can update the
    carried arrays in place."""
    lanes, cap = d.lens.shape
    lane = jnp.arange(lanes, dtype=I32)
    r = d.rank_of[lane, tag]
    iota = jnp.arange(cap, dtype=I32)[None, :]
    valid = iota < d.n[:, None]
    bump = valid & active[:, None] & (d.rank_of < r[:, None])
    rank_of = jnp.where(bump, d.rank_of + 1, d.rank_of)
    rank_of = rank_of.at[lane, jnp.where(active, tag, cap)].set(0, mode="drop")
    shifted = jnp.roll(d.tag_of, 1, axis=1)
    tag_of = jnp.where(active[:, None] & (iota <= r[:, None]), shifted, d.tag_of)
    tag_of = tag_of.at[jnp.where(active, lane, lanes), 0].set(tag, mode="drop")
    return d._replace(rank_of=rank_of, tag_of=tag_of)


def dict_insert(
    d: DictState, frag: jax.Array, frag_len: jax.Array, active: jax.Array
) -> Tuple[DictState, jax.Array]:
    """Append a fragment as a new entry (tag = n) at recency rank 0
    (dict.c:91-103; rank 0 because its last_pos is the current, maximal,
    position).  Returns (state, new_tag)."""
    lanes, cap = d.lens.shape
    lane = jnp.arange(lanes, dtype=I32)
    room = d.n < cap
    do = active & room
    slot = jnp.minimum(d.n, cap - 1)
    sidx = jnp.where(do, slot, cap)
    strs = d.strs.at[lane, sidx].set(frag, mode="drop")
    lens = d.lens.at[lane, sidx].set(frag_len, mode="drop")
    iota = jnp.arange(cap, dtype=I32)[None, :]
    valid = iota < d.n[:, None]
    rank_of = jnp.where(do[:, None] & valid, d.rank_of + 1, d.rank_of)
    rank_of = rank_of.at[lane, sidx].set(0, mode="drop")
    shifted = jnp.roll(d.tag_of, 1, axis=1)
    tag_of = jnp.where(do[:, None] & (iota > 0), shifted, d.tag_of)
    tag_of = tag_of.at[jnp.where(do, lane, lanes), 0].set(slot, mode="drop")
    n = d.n + jnp.where(do, 1, 0).astype(I32)
    overflow = d.overflow | (active & ~room)
    return (
        DictState(strs, lens, n, rank_of, tag_of, overflow),
        slot,
    )
