"""Lane-parallel order-1/order-2 context tables with three-tier storage.

A context is a list of (tag, freq) items in insertion order; a tag is coded
through a throwaway model whose symbol index is the item's insertion
position (context.c:95-152 — the reference's frequency sort is compiled
out, context.c:75-86).

Context-table sizes are extremely skewed (measured on 4 MB diverse text:
194K contexts, almost all < 16 items, a few reaching ~1.5K), so storage is
tiered:

  * **hub** — context id 0, the fallback for unknown tag pairs (x3.c:63-67)
    and the post-E_NEW reset context: full capacity row per lane.
  * **small pool** — [S, CS] array for ids >= 1 (CS ~ 16 covers the p99).
  * **promoted rows** — [M, CB] big rows; when a small row fills up its
    items are copied to a freshly allocated big row and the context is
    redirected there (``promo`` holds row+1, 0 = not promoted).

Every operation computes the three paths masked and selects per lane; all
updates are pure drop-mode scatters / scatter-adds (no gather + write-back)
so XLA keeps the pools in place across while_loop iterations.

The (tag0, tag1) -> dense-id pair map (tag_pair.c) is *folded into the
order-1 family*: a pair (t0, t1) is registered exactly when t1 first enters
context t0's item list (both happen in the same event update,
x3.c:195-222), so each ctx1 item slot carries the pair's dense id, assigned
from a per-lane insertion counter — reproducing the reference's
insertion-order ids without any BST or hash table.  The order-2 family has
no pair payload (``*_pair`` arrays are None).
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
    tags: jax.Array       # i32 [L, S, CS] — small pool, ids 1..S at row id-1
    freqs: jax.Array      # i32 [L, S, CS]
    pair: Optional[jax.Array]      # i32 [L, S, CS] | None
    n: jax.Array          # i32 [L, S]
    promo: jax.Array      # i32 [L, S] — 0 = small; k>0 = big row k-1
    big_tags: jax.Array   # i32 [L, M, CB]
    big_freqs: jax.Array  # i32 [L, M, CB]
    big_pair: Optional[jax.Array]  # i32 [L, M, CB] | None
    big_n: jax.Array      # i32 [L, M]
    promo_n: jax.Array    # i32 [L] — allocated big rows
    overflow: jax.Array   # bool [L]


class CtxView(NamedTuple):
    """Per-lane view of one context's table (tier resolved)."""

    cid: jax.Array        # i32 [L]
    hub_sel: jax.Array    # bool [L]
    row: jax.Array        # i32 [L] — small row (cid-1 clamped)
    big_sel: jax.Array    # bool [L] — promoted?
    brow: jax.Array       # i32 [L] — big row index (clamped)
    n: jax.Array          # i32 [L] — item count of the selected context


def ctx_init(
    lanes: int, hub_cap: int, pool_rows: int, items_cap: int,
    with_pair: bool = False, small_cap: int = 16, promo_rows: int = 0,
) -> CtxFamily:
    """``items_cap`` is the promoted-row (and hub-independent) capacity;
    ``small_cap`` the per-context small-pool width; ``promo_rows`` the
    number of big rows (0 derives a default)."""
    M = promo_rows or max(pool_rows // 8, 16)
    small_cap = min(small_cap, items_cap)  # big rows must fit a small copy
    mk = lambda shape: jnp.zeros(shape, I32)
    return CtxFamily(
        hub_tags=mk((lanes, hub_cap)),
        hub_freqs=mk((lanes, hub_cap)),
        hub_pair=mk((lanes, hub_cap)) if with_pair else None,
        hub_n=mk((lanes,)),
        tags=mk((lanes, pool_rows, small_cap)),
        freqs=mk((lanes, pool_rows, small_cap)),
        pair=mk((lanes, pool_rows, small_cap)) if with_pair else None,
        n=mk((lanes, pool_rows)),
        promo=mk((lanes, pool_rows)),
        big_tags=mk((lanes, M, items_cap)),
        big_freqs=mk((lanes, M, items_cap)),
        big_pair=mk((lanes, M, items_cap)) if with_pair else None,
        big_n=mk((lanes, M)),
        promo_n=mk((lanes,)),
        overflow=jnp.zeros((lanes,), jnp.bool_),
    )


def ctx_view(fam: CtxFamily, cid: jax.Array) -> CtxView:
    lanes = cid.shape[0]
    lane = jnp.arange(lanes, dtype=I32)
    hub_sel = cid == 0
    row = jnp.clip(cid - 1, 0, fam.tags.shape[1] - 1)
    pr = fam.promo[lane, row]
    big_sel = ~hub_sel & (pr > 0)
    brow = jnp.clip(pr - 1, 0, fam.big_tags.shape[1] - 1)
    n = jnp.where(
        hub_sel, fam.hub_n,
        jnp.where(big_sel, fam.big_n[lane, brow], fam.n[lane, row]),
    )
    return CtxView(cid, hub_sel, row, big_sel, brow, n)


def _rows(fam: CtxFamily, v: CtxView):
    """(small_tags, small_freqs, big_tags, big_freqs) per-lane rows."""
    lanes = v.cid.shape[0]
    lane = jnp.arange(lanes, dtype=I32)
    return (
        fam.tags[lane, v.row], fam.freqs[lane, v.row],
        fam.big_tags[lane, v.brow], fam.big_freqs[lane, v.brow],
    )


def ctx_find(
    fam: CtxFamily, v: CtxView, tag: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Locate ``tag`` in the context (ctx_query_tag_index, context.c:31-40).

    Returns (found [L]b, pos [L]i — insertion index == model symbol,
    pair_id [L]i — the (cid_tag, tag) pair's dense id; zeros for a family
    without pair payloads)."""
    H = fam.hub_tags.shape[1]
    CS = fam.tags.shape[2]
    CB = fam.big_tags.shape[2]
    lanes = tag.shape[0]
    lane = jnp.arange(lanes, dtype=I32)
    iota_h = jnp.arange(H, dtype=I32)[None, :]
    iota_s = jnp.arange(CS, dtype=I32)[None, :]
    iota_b = jnp.arange(CB, dtype=I32)[None, :]

    hmask = (fam.hub_tags == tag[:, None]) & (iota_h < fam.hub_n[:, None])
    hfound = jnp.any(hmask, axis=1)
    hpos = jnp.argmax(hmask, axis=1).astype(I32)

    stags, _, btags, _ = _rows(fam, v)
    smask = (stags == tag[:, None]) & (iota_s < v.n[:, None])
    sfound = jnp.any(smask, axis=1)
    spos = jnp.argmax(smask, axis=1).astype(I32)
    bmask = (btags == tag[:, None]) & (iota_b < v.n[:, None])
    bfound = jnp.any(bmask, axis=1)
    bpos = jnp.argmax(bmask, axis=1).astype(I32)

    found = jnp.where(v.hub_sel, hfound, jnp.where(v.big_sel, bfound, sfound))
    pos = jnp.where(v.hub_sel, hpos, jnp.where(v.big_sel, bpos, spos))
    if fam.hub_pair is None:
        pair_id = jnp.zeros((lanes,), I32)
    else:
        spair = fam.pair[lane, v.row]
        bpair = fam.big_pair[lane, v.brow]
        pair_id = jnp.where(
            v.hub_sel, fam.hub_pair[lane, hpos],
            jnp.where(v.big_sel, bpair[lane, bpos], spair[lane, spos]),
        )
    return found, pos, pair_id


def ctx_encode_stats(
    fam: CtxFamily, v: CtxView, pos: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(low_f, span, total) of coding the item at ``pos`` through the
    context's throwaway model (context.c:95-133)."""
    H = fam.hub_tags.shape[1]
    CS = fam.tags.shape[2]
    CB = fam.big_tags.shape[2]
    lanes = pos.shape[0]
    lane = jnp.arange(lanes, dtype=I32)
    iota_h = jnp.arange(H, dtype=I32)[None, :]
    iota_s = jnp.arange(CS, dtype=I32)[None, :]
    iota_b = jnp.arange(CB, dtype=I32)[None, :]

    def stats(freqs, iota, cap):
        valid = iota < v.n[:, None]
        low = jnp.sum(jnp.where(valid & (iota < pos[:, None]), freqs, 0), axis=1)
        total = jnp.sum(jnp.where(valid, freqs, 0), axis=1)
        span = freqs[lane, jnp.minimum(pos, cap - 1)]
        return low, span, total

    hvalid = iota_h < fam.hub_n[:, None]
    hlow = jnp.sum(
        jnp.where(hvalid & (iota_h < pos[:, None]), fam.hub_freqs, 0), axis=1
    )
    htotal = jnp.sum(jnp.where(hvalid, fam.hub_freqs, 0), axis=1)
    hspan = fam.hub_freqs[lane, jnp.minimum(pos, H - 1)]

    _, sfreqs, _, bfreqs = _rows(fam, v)
    slow, sspan, stotal = stats(sfreqs, iota_s, CS)
    blow, bspan, btotal = stats(bfreqs, iota_b, CB)

    low = jnp.where(v.hub_sel, hlow, jnp.where(v.big_sel, blow, slow))
    span = jnp.where(v.hub_sel, hspan, jnp.where(v.big_sel, bspan, sspan))
    total = jnp.where(v.hub_sel, htotal, jnp.where(v.big_sel, btotal, stotal))
    return low, span, total


def ctx_decode_pos(
    fam: CtxFamily, v: CtxView, value: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Find the item whose cumulative interval contains ``value``
    (index_of_value over the throwaway model, ac.c:167-179).

    Returns (pos, tag_at_pos, low_f, span)."""
    H = fam.hub_tags.shape[1]
    CS = fam.tags.shape[2]
    CB = fam.big_tags.shape[2]
    lanes = value.shape[0]
    lane = jnp.arange(lanes, dtype=I32)

    def search(tags, freqs_raw, iota, cap, nvec):
        valid = iota < nvec[:, None]
        freqs = jnp.where(valid, freqs_raw, 0)
        cum = jnp.cumsum(freqs, axis=1) - freqs
        le = valid & (cum.astype(jnp.uint32) <= value[:, None])
        pos = jnp.maximum(jnp.sum(le, axis=1).astype(I32) - 1, 0)
        cpos = jnp.minimum(pos, cap - 1)
        return pos, tags[lane, cpos], cum[lane, cpos], freqs[lane, cpos]

    iota_h = jnp.arange(H, dtype=I32)[None, :]
    iota_s = jnp.arange(CS, dtype=I32)[None, :]
    iota_b = jnp.arange(CB, dtype=I32)[None, :]

    hpos, htag, hlow, hspan = search(
        fam.hub_tags, fam.hub_freqs, iota_h, H, fam.hub_n
    )
    stags, sfreqs, btags, bfreqs = _rows(fam, v)
    spos, stag, slow, sspan = search(stags, sfreqs, iota_s, CS, v.n)
    bpos, btag, blow, bspan = search(btags, bfreqs, iota_b, CB, v.n)

    pos = jnp.where(v.hub_sel, hpos, jnp.where(v.big_sel, bpos, spos))
    tag = jnp.where(v.hub_sel, htag, jnp.where(v.big_sel, btag, stag))
    low = jnp.where(v.hub_sel, hlow, jnp.where(v.big_sel, blow, slow))
    span = jnp.where(v.hub_sel, hspan, jnp.where(v.big_sel, bspan, sspan))
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
    (x3.c:197-209).  A small row that fills up is promoted: its items are
    copied into a freshly allocated big row and the context redirected.
    When appending and ``new_pair_id`` is given (ctx1 family), store it in
    the item's pair slot — this *is* the reference's tag_pair_add
    (x3.c:213-222)."""
    H = fam.hub_tags.shape[1]
    CS = fam.tags.shape[2]
    CB = fam.big_tags.shape[2]
    S = fam.tags.shape[1]
    M = fam.big_tags.shape[1]
    lanes = tag.shape[0]
    lane = jnp.arange(lanes, dtype=I32)
    one = jnp.ones((lanes,), I32)

    app = active & ~found
    inc = active & found

    # ---------- hub path
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

    # ---------- promotion: small row full and this append needs a big row
    need_promo = ~v.hub_sel & ~v.big_sel & app & (v.n >= CS)
    can_promo = fam.promo_n < M
    do_promo = need_promo & can_promo
    new_brow = jnp.where(do_promo, fam.promo_n, M)  # drop target when idle
    # copy the CS small items into the first CS slots of the big row
    stags, sfreqs, btags_row, bfreqs_row = _rows(fam, v)
    padw = CB - CS
    src_tags = jnp.pad(stags, ((0, 0), (0, padw)))
    src_freqs = jnp.pad(sfreqs, ((0, 0), (0, padw)))
    big_tags = fam.big_tags.at[lane, new_brow].set(src_tags, mode="drop")
    big_freqs = fam.big_freqs.at[lane, new_brow].set(src_freqs, mode="drop")
    big_pair = fam.big_pair
    if new_pair_id is not None:
        spair = fam.pair[lane, v.row]
        big_pair = fam.big_pair.at[lane, new_brow].set(
            jnp.pad(spair, ((0, 0), (0, padw))), mode="drop"
        )
    big_n = fam.big_n.at[lane, new_brow].set(v.n, mode="drop")
    promo = fam.promo.at[lane, jnp.where(do_promo, v.row, S)].set(
        new_brow + 1, mode="drop"
    )
    promo_n = fam.promo_n + jnp.where(do_promo, 1, 0).astype(I32)

    big_now = v.big_sel | do_promo
    brow_now = jnp.where(do_promo, new_brow, v.brow)

    # ---------- small path (not promoted, still room)
    sdo = ~v.hub_sel & ~big_now
    sinc_idx = jnp.where(sdo & inc, jnp.minimum(pos, CS - 1), CS)
    freqs = fam.freqs.at[lane, v.row, sinc_idx].add(one, mode="drop")
    sapp = sdo & app  # v.n < CS guaranteed (else promoted above)
    sapp_idx = jnp.where(sapp, jnp.minimum(v.n, CS - 1), CS)
    tags = fam.tags.at[lane, v.row, sapp_idx].set(tag, mode="drop")
    freqs = freqs.at[lane, v.row, sapp_idx].set(1, mode="drop")
    pair = fam.pair
    if new_pair_id is not None:
        pair = fam.pair.at[lane, v.row, sapp_idx].set(new_pair_id, mode="drop")
    n = fam.n.at[lane, jnp.where(sapp, v.row, S)].add(one, mode="drop")

    # ---------- big path (previously promoted or promoted just now)
    bdo = ~v.hub_sel & big_now
    big_room = v.n < CB
    binc_idx = jnp.where(bdo & inc, jnp.minimum(pos, CB - 1), CB)
    big_freqs = big_freqs.at[lane, brow_now, binc_idx].add(one, mode="drop")
    bapp = bdo & app & big_room
    bapp_idx = jnp.where(bapp, jnp.minimum(v.n, CB - 1), CB)
    big_tags = big_tags.at[lane, brow_now, bapp_idx].set(tag, mode="drop")
    big_freqs = big_freqs.at[lane, brow_now, bapp_idx].set(1, mode="drop")
    if new_pair_id is not None:
        big_pair = big_pair.at[lane, brow_now, bapp_idx].set(
            new_pair_id, mode="drop"
        )
    big_n = big_n.at[lane, jnp.where(bapp, brow_now, M)].add(one, mode="drop")

    overflow = fam.overflow | (
        (v.hub_sel & app & ~hub_room)
        | (need_promo & ~can_promo)
        | (bdo & app & ~big_room)
    )
    return CtxFamily(
        hub_tags, hub_freqs, hub_pair, hub_n,
        tags, freqs, pair, n, promo,
        big_tags, big_freqs, big_pair, big_n, promo_n, overflow,
    )
