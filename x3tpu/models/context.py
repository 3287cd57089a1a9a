"""Lane-parallel order-1/order-2 context tables.

A context is a list of (tag, freq) items in insertion order; a tag is coded
through a throwaway model whose symbol index is the item's insertion
position (context.c:95-152 — the reference's frequency sort is compiled
out, context.c:75-86).

Context id 0 is a *hub*: it is both the fallback for unknown tag pairs
(x3.c:63-67) and the context reached after every E_NEW reset, so it
accumulates far more distinct tags than any other context.  Storage is
therefore split into a full-capacity hub row plus a [S, C]-pooled array for
ids >= 1; every operation computes both paths masked and selects by
``cid == 0``.

The (tag0, tag1) -> dense-id pair map (tag_pair.c) is *folded into the
order-1 family*: a pair (t0, t1) is registered exactly when t1 first enters
context t0's item list (both happen in the same event update,
x3.c:195-222), so each ctx1 item slot carries the pair's dense id, assigned
from a per-lane insertion counter — reproducing the reference's
insertion-order ids without any BST or hash table.  The order-2 family has
no pair payload (``pair`` arrays are None).

All state updates are pure drop-mode scatters / scatter-adds with no
gather-plus-write-back, so XLA keeps the (large) carried pools in place
across while_loop iterations instead of copying them.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

I32 = jnp.int32


class CtxFamily(NamedTuple):
    hub_tags: jax.Array   # i32 [L, H] — context id 0
    hub_freqs: jax.Array  # i32 [L, H]
    hub_pair: Optional[jax.Array]  # i32 [L, H] | None (ctx1 family only)
    hub_n: jax.Array      # i32 [L]
    tags: jax.Array       # i32 [L, S, C] — context ids 1..S at row id-1
    freqs: jax.Array      # i32 [L, S, C]
    pair: Optional[jax.Array]      # i32 [L, S, C] | None
    n: jax.Array          # i32 [L, S]
    overflow: jax.Array   # bool [L]


class CtxView(NamedTuple):
    """Per-lane view of one context's table, produced by :func:`ctx_view`
    and consumed by find/stats/update (hub and pooled paths precomputed)."""

    cid: jax.Array        # i32 [L]
    hub_sel: jax.Array    # bool [L]
    row: jax.Array        # i32 [L] — pooled row index (cid-1 clamped)
    n: jax.Array          # i32 [L] — item count of the selected context


def ctx_init(
    lanes: int, hub_cap: int, pool_rows: int, items_cap: int,
    with_pair: bool = False,
) -> CtxFamily:
    return CtxFamily(
        hub_tags=jnp.zeros((lanes, hub_cap), I32),
        hub_freqs=jnp.zeros((lanes, hub_cap), I32),
        hub_pair=jnp.zeros((lanes, hub_cap), I32) if with_pair else None,
        hub_n=jnp.zeros((lanes,), I32),
        tags=jnp.zeros((lanes, pool_rows, items_cap), I32),
        freqs=jnp.zeros((lanes, pool_rows, items_cap), I32),
        pair=jnp.zeros((lanes, pool_rows, items_cap), I32) if with_pair else None,
        n=jnp.zeros((lanes, pool_rows), I32),
        overflow=jnp.zeros((lanes,), jnp.bool_),
    )


def ctx_view(fam: CtxFamily, cid: jax.Array) -> CtxView:
    lanes = cid.shape[0]
    lane = jnp.arange(lanes, dtype=I32)
    hub_sel = cid == 0
    row = jnp.clip(cid - 1, 0, fam.tags.shape[1] - 1)
    n = jnp.where(hub_sel, fam.hub_n, fam.n[lane, row])
    return CtxView(cid, hub_sel, row, n)


def ctx_find(
    fam: CtxFamily, v: CtxView, tag: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Locate ``tag`` in the context (ctx_query_tag_index, context.c:31-40).

    Returns (found [L]b, pos [L]i — insertion index == model symbol,
    pair_id [L]i — the (cid_tag, tag) pair's dense id; zeros for a family
    without pair payloads)."""
    H = fam.hub_tags.shape[1]
    C = fam.tags.shape[2]
    iota_h = jnp.arange(H, dtype=I32)[None, :]
    iota_c = jnp.arange(C, dtype=I32)[None, :]
    lanes = tag.shape[0]
    lane = jnp.arange(lanes, dtype=I32)

    hmask = (fam.hub_tags == tag[:, None]) & (iota_h < fam.hub_n[:, None])
    hfound = jnp.any(hmask, axis=1)
    hpos = jnp.argmax(hmask, axis=1).astype(I32)

    ptags = fam.tags[lane, v.row]
    pmask = (ptags == tag[:, None]) & (iota_c < v.n[:, None])
    pfound = jnp.any(pmask, axis=1)
    ppos = jnp.argmax(pmask, axis=1).astype(I32)

    found = jnp.where(v.hub_sel, hfound, pfound)
    pos = jnp.where(v.hub_sel, hpos, ppos)
    if fam.hub_pair is None:
        pair_id = jnp.zeros((lanes,), I32)
    else:
        ppair = fam.pair[lane, v.row]
        pair_id = jnp.where(
            v.hub_sel, fam.hub_pair[lane, hpos], ppair[lane, ppos]
        )
    return found, pos, pair_id


def ctx_encode_stats(
    fam: CtxFamily, v: CtxView, pos: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(low_f, span, total) of coding the item at ``pos`` through the
    context's throwaway model (context.c:95-133)."""
    H = fam.hub_tags.shape[1]
    C = fam.tags.shape[2]
    iota_h = jnp.arange(H, dtype=I32)[None, :]
    iota_c = jnp.arange(C, dtype=I32)[None, :]
    lanes = pos.shape[0]
    lane = jnp.arange(lanes, dtype=I32)

    hvalid = iota_h < fam.hub_n[:, None]
    hlow = jnp.sum(
        jnp.where(hvalid & (iota_h < pos[:, None]), fam.hub_freqs, 0), axis=1
    )
    htotal = jnp.sum(jnp.where(hvalid, fam.hub_freqs, 0), axis=1)
    hspan = fam.hub_freqs[lane, jnp.minimum(pos, H - 1)]

    pfreqs = fam.freqs[lane, v.row]
    pvalid = iota_c < v.n[:, None]
    plow = jnp.sum(jnp.where(pvalid & (iota_c < pos[:, None]), pfreqs, 0), axis=1)
    ptotal = jnp.sum(jnp.where(pvalid, pfreqs, 0), axis=1)
    pspan = pfreqs[lane, jnp.minimum(pos, C - 1)]

    low = jnp.where(v.hub_sel, hlow, plow)
    span = jnp.where(v.hub_sel, hspan, pspan)
    total = jnp.where(v.hub_sel, htotal, ptotal)
    return low, span, total


def ctx_decode_pos(
    fam: CtxFamily, v: CtxView, value: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Find the item whose cumulative interval contains ``value``
    (index_of_value over the throwaway model, ac.c:167-179).

    Returns (pos, tag_at_pos, low_f, span)."""
    H = fam.hub_tags.shape[1]
    C = fam.tags.shape[2]
    iota_h = jnp.arange(H, dtype=I32)[None, :]
    iota_c = jnp.arange(C, dtype=I32)[None, :]
    lanes = value.shape[0]
    lane = jnp.arange(lanes, dtype=I32)

    hvalid = iota_h < fam.hub_n[:, None]
    hfreqs = jnp.where(hvalid, fam.hub_freqs, 0)
    hcum = jnp.cumsum(hfreqs, axis=1) - hfreqs  # exclusive prefix
    hle = hvalid & (hcum.astype(jnp.uint32) <= value[:, None])
    hpos = jnp.maximum(jnp.sum(hle, axis=1).astype(I32) - 1, 0)
    hlow = hcum[lane, jnp.minimum(hpos, H - 1)]
    hspan = hfreqs[lane, jnp.minimum(hpos, H - 1)]
    htag = fam.hub_tags[lane, jnp.minimum(hpos, H - 1)]

    ptags = fam.tags[lane, v.row]
    pfreqs_raw = fam.freqs[lane, v.row]
    pvalid = iota_c < v.n[:, None]
    pfreqs = jnp.where(pvalid, pfreqs_raw, 0)
    pcum = jnp.cumsum(pfreqs, axis=1) - pfreqs
    ple = pvalid & (pcum.astype(jnp.uint32) <= value[:, None])
    ppos = jnp.maximum(jnp.sum(ple, axis=1).astype(I32) - 1, 0)
    plow = pcum[lane, jnp.minimum(ppos, C - 1)]
    pspan = pfreqs[lane, jnp.minimum(ppos, C - 1)]
    ptag = ptags[lane, jnp.minimum(ppos, C - 1)]

    pos = jnp.where(v.hub_sel, hpos, ppos)
    tag = jnp.where(v.hub_sel, htag, ptag)
    low = jnp.where(v.hub_sel, hlow, plow)
    span = jnp.where(v.hub_sel, hspan, pspan)
    return pos, tag, low, span


def ctx_update(
    fam: CtxFamily,
    v: CtxView,
    tag: jax.Array,
    found: jax.Array,
    pos: jax.Array,
    active: jax.Array,
    new_pair_id: Optional[jax.Array] = None,
) -> CtxFamily:
    """Post-event update: bump the tag's freq, or append it with freq 1
    (x3.c:197-209).  When appending and ``new_pair_id`` is given (ctx1
    family), store it in the item's pair slot — this *is* the reference's
    tag_pair_add (x3.c:213-222).  Pure drop-mode scatters throughout."""
    H = fam.hub_tags.shape[1]
    C = fam.tags.shape[2]
    S = fam.tags.shape[1]
    lanes = tag.shape[0]
    lane = jnp.arange(lanes, dtype=I32)

    app = active & ~found
    inc = active & found
    one = jnp.ones((lanes,), I32)

    # --- hub path
    hub_room = fam.hub_n < H
    hinc_idx = jnp.where(v.hub_sel & inc, jnp.minimum(pos, H - 1), H)
    hub_freqs = fam.hub_freqs.at[lane, hinc_idx].add(one, mode="drop")
    happ = v.hub_sel & app & hub_room
    happ_idx = jnp.where(happ, fam.hub_n, H)
    hub_tags = fam.hub_tags.at[lane, happ_idx].set(tag, mode="drop")
    hub_freqs = hub_freqs.at[lane, happ_idx].set(1, mode="drop")
    hub_pair = fam.hub_pair
    if new_pair_id is not None:
        hub_pair = fam.hub_pair.at[lane, happ_idx].set(new_pair_id, mode="drop")
    hub_n = fam.hub_n + jnp.where(happ, 1, 0).astype(I32)

    # --- pooled path
    pool_room = v.n < C
    pinc_idx = jnp.where(~v.hub_sel & inc, jnp.minimum(pos, C - 1), C)
    freqs = fam.freqs.at[lane, v.row, pinc_idx].add(one, mode="drop")
    papp = ~v.hub_sel & app & pool_room
    papp_idx = jnp.where(papp, v.n, C)
    tags = fam.tags.at[lane, v.row, papp_idx].set(tag, mode="drop")
    freqs = freqs.at[lane, v.row, papp_idx].set(1, mode="drop")
    pair = fam.pair
    if new_pair_id is not None:
        pair = fam.pair.at[lane, v.row, papp_idx].set(new_pair_id, mode="drop")
    n = fam.n.at[lane, jnp.where(papp, v.row, S)].add(one, mode="drop")

    overflow = fam.overflow | (app & jnp.where(v.hub_sel, ~hub_room, ~pool_room))
    return CtxFamily(
        hub_tags, hub_freqs, hub_pair, hub_n, tags, freqs, pair, n, overflow
    )
