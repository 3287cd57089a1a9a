"""Codec-VM context-row machinery.

A context (context.c: per-context list of (tag, freq) items in insertion
order, plus — for the order-1 family — the dense pair id registered when
the item was appended, tag_pair.c) is stored as ONE 128-lane i32 HBM row,
DMA'd into VMEM scratch per event:

  inline ctx0 row: [n | tags[63] | freqs[63] | spare]
  inline ctx1 row: [n | tags[42] | freqs[42] | pairs[42]]

A context that outgrows its inline row is *promoted* to a PB=16-row span
in the same HBM array (header flips to -(span_index+1)):

  ctx0 span: row 0 = [n | ...], tags rows 1..7 (896), freqs rows 8..14
  ctx1 span: row 0 = [n | ...], tags 1..5 (640), freqs 6..10, pairs 11..15

A row that outgrows its big span (measured on the 4 MB binary-block
regime: ctx1 rows to 7449 items, /tmp/ref4mb.log) is promoted again to a
*huge* span — one contiguous block of ``1 + nsec*nr2`` rows after the big
spans in the same HBM array (header index >= m encodes huge slot
``idx - m``):

  huge span: row 0 = [n | ...], tags rows 1..nr2,
             freqs rows 1+nr2..2*nr2 [, pairs rows 1+2*nr2..3*nr2]

Promotion big->huge is O(1): the big span's section rows are copied into
the first rows of each huge section (no per-item movement).  The tier is
compiled in only when ``nr2 > 0`` (static); default configs carry zero
extra code.

Context id 0 (the unknown-pair fallback / post-E_NEW reset context,
x3.c:63-67) is the hottest and largest; it lives in dense VMEM hub planes
instead.  Every operation computes the tier paths (hub / inline / big
[/ huge]) masked and selects per lane — the same structure as the XLA
three-tier storage in x3tpu/models/context.py, re-laid-out for Mosaic.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from x3tpu.vm.config import IN0, IN1, LANES, PB
from x3tpu.vm.prims import col_iota

I32 = jnp.int32

# inline row column layout
C0_TAGS, C0_FREQS = 1, 64                  # ctx0: tags 1..63, freqs 64..126
C1_TAGS, C1_FREQS, C1_PAIRS = 1, 43, 85    # ctx1: 42 items per section
# big-span row layout (rows within the PB-row span)
B0_TAGS, B0_NT = 1, 7                      # ctx0: tags rows 1..7
B0_FREQS = 8                               # freqs rows 8..14
B1_TAGS, B1_NT = 1, 5                      # ctx1: tags rows 1..5
B1_FREQS, B1_PAIRS = 6, 11


class Family(NamedTuple):
    """Static layout of one context family inside the kernel."""

    inline_cap: int     # IN0 | IN1
    tags_col: int
    freqs_col: int
    pairs_col: Optional[int]
    big_tags_row: int
    big_nrows: int
    big_freqs_row: int
    big_pairs_row: Optional[int]

    @property
    def big_cap(self) -> int:
        return self.big_nrows * 128


FAM0 = Family(IN0, C0_TAGS, C0_FREQS, None, B0_TAGS, B0_NT, B0_FREQS, None)
FAM1 = Family(IN1, C1_TAGS, C1_FREQS, C1_PAIRS, B1_TAGS, B1_NT, B1_FREQS,
              B1_PAIRS)


# NOTE on shapes: every vector value in this module is kept rank-2
# [8, 128-multiple].  Rank-3 values (and the rank-1 results of
# axis=(1,2) reductions) crash Mosaic's vector layout inference
# (VectorLayout::join in inferElementwise, observed on hardware), so the
# big-span paths statically unroll over the span's rows instead.


class RowView(NamedTuple):
    """Per-lane resolved view of one context's storage tier (values)."""

    cid: jax.Array       # [8,1]
    is_hub: jax.Array    # [8,1] bool
    is_big: jax.Array    # [8,1] bool
    n: jax.Array         # [8,1] item count
    is_huge: object = None   # [8,1] bool, or None when the tier is off


def row_view(fam: Family, cid, in_scr, big_scr, hub_n, active,
             hug_scr=None, m=0):
    """Resolve the tier for context ``cid``; inline/big/huge content must
    already be DMA'd into the scratch refs for non-hub lanes.  ``m`` (big
    spans per lane) splits negative headers: idx < m -> big span idx,
    idx >= m -> huge slot idx - m (only when ``hug_scr`` is given)."""
    is_hub = cid == 0
    hdr = in_scr[:, 0, 0:1]
    neg = active & ~is_hub & (hdr < 0)
    if hug_scr is None:
        is_big = neg
        n = jnp.where(is_hub, hub_n,
                      jnp.where(is_big, big_scr[:, 0, 0:1], hdr))
        n = jnp.where(active, n, 0)
        return RowView(cid, is_hub, is_big, n)
    idx = -hdr - 1
    is_big = neg & (idx < m)
    is_huge = neg & (idx >= m)
    n = jnp.where(
        is_hub, hub_n,
        jnp.where(is_big, big_scr[:, 0, 0:1],
                  jnp.where(is_huge, hug_scr[:, 0, 0:1], hdr)),
    )
    n = jnp.where(active, n, 0)
    return RowView(cid, is_hub, is_big, n, is_huge)


def row_find(fam: Family, v: RowView, tag, in_scr, big_scr,
             hub_t, hub_f, hub_p, hug_scr=None, nr2=0):
    """Locate ``tag`` (ctx_query_tag_index, context.c:31-40).  Returns
    (found [8,1]b, pos [8,1] — insertion index == model symbol, pair_id
    [8,1]).  Tags are unique within a context, so positions come from
    masked sums, no argmax."""
    IN = fam.inline_cap
    it = col_iota(IN)
    tags_in = in_scr[:, 0, fam.tags_col : fam.tags_col + IN]
    m_in = (tags_in == tag) & (it < v.n)
    found_in = jnp.any(m_in, axis=1, keepdims=True)
    pos_in = jnp.sum(jnp.where(m_in, it, 0), axis=1, keepdims=True)

    found_b = jnp.zeros((LANES, 1), jnp.bool_)
    pos_b = jnp.zeros((LANES, 1), I32)
    p_b = jnp.zeros((LANES, 1), I32)
    i128 = col_iota(128)
    for r in range(fam.big_nrows):
        idx = i128 + r * 128
        bt_r = big_scr[:, fam.big_tags_row + r, :]
        m_r = (bt_r == tag) & (idx < v.n)
        found_b = found_b | jnp.any(m_r, axis=1, keepdims=True)
        pos_b = pos_b + jnp.sum(jnp.where(m_r, idx, 0), axis=1,
                                keepdims=True)
        if fam.pairs_col is not None:
            bp_r = big_scr[:, fam.big_pairs_row + r, :]
            p_b = p_b + jnp.sum(jnp.where(m_r, bp_r, 0), axis=1,
                                keepdims=True)

    if nr2:
        # huge span: same masked scan over nr2 128-item rows per section;
        # junk contributions from other-tier lanes die in the final select
        found_g = jnp.zeros((LANES, 1), jnp.bool_)
        pos_g = jnp.zeros((LANES, 1), I32)
        p_g = jnp.zeros((LANES, 1), I32)
        for r in range(nr2):
            idx = i128 + r * 128
            gt_r = hug_scr[:, 1 + r, :]
            m_r = (gt_r == tag) & (idx < v.n)
            found_g = found_g | jnp.any(m_r, axis=1, keepdims=True)
            pos_g = pos_g + jnp.sum(jnp.where(m_r, idx, 0), axis=1,
                                    keepdims=True)
            if fam.pairs_col is not None:
                gp_r = hug_scr[:, 1 + 2 * nr2 + r, :]
                p_g = p_g + jnp.sum(jnp.where(m_r, gp_r, 0), axis=1,
                                    keepdims=True)

    H = hub_t.shape[1]
    ih = col_iota(H)
    hub_n = jnp.where(v.is_hub, v.n, 0)
    m_h = (hub_t == tag) & (ih < hub_n)
    found_h = jnp.any(m_h, axis=1, keepdims=True)
    pos_h = jnp.sum(jnp.where(m_h, ih, 0), axis=1, keepdims=True)

    # logical (not where) select: i1-operand arith.select hits an
    # unsupported i8->i1 truncation in Mosaic (hardware compile error)
    if nr2:
        found = ((v.is_hub & found_h)
                 | (v.is_big & found_b)
                 | (v.is_huge & found_g)
                 | (~v.is_hub & ~v.is_big & ~v.is_huge & found_in))
        pos = jnp.where(v.is_hub, pos_h,
                        jnp.where(v.is_big, pos_b,
                                  jnp.where(v.is_huge, pos_g, pos_in)))
    else:
        found = ((v.is_hub & found_h)
                 | (~v.is_hub & v.is_big & found_b)
                 | (~v.is_hub & ~v.is_big & found_in))
        pos = jnp.where(v.is_hub, pos_h, jnp.where(v.is_big, pos_b, pos_in))

    if fam.pairs_col is None:
        pair = jnp.zeros_like(pos)
    else:
        pr_in = in_scr[:, 0, fam.pairs_col : fam.pairs_col + IN]
        p_in = jnp.sum(jnp.where(m_in, pr_in, 0), axis=1, keepdims=True)
        p_h = jnp.sum(jnp.where(m_h, hub_p, 0), axis=1, keepdims=True)
        if nr2:
            pair = jnp.where(v.is_hub, p_h,
                             jnp.where(v.is_big, p_b,
                                       jnp.where(v.is_huge, p_g, p_in)))
        else:
            pair = jnp.where(v.is_hub, p_h, jnp.where(v.is_big, p_b, p_in))
    return found, pos, pair


def row_stats(fam: Family, v: RowView, pos, in_scr, big_scr, hub_f,
              hug_scr=None, nr2=0):
    """(low, span, total) of coding insertion index ``pos`` through the
    context's throwaway model (context.c:95-133).

    FREQ REPRESENTATION (round 4): every freq section stores the
    INCLUSIVE cumulative sum of item freqs, with every element past the
    item count carrying the row total (the ixf trick, kernel.py
    ph_mode).  low/span/total become masked point reads + a static
    tail read instead of per-row sums, and row_decode_pos drops its
    per-row cumsum chains entirely — the measured decode bottleneck
    (+9.6 of 15.7 us/event-group, hw_vm_ablate_dec round 4).  All
    update paths in row_update maintain the tail-total invariant."""
    IN = fam.inline_cap
    it = col_iota(IN)
    fr_in = in_scr[:, 0, fam.freqs_col : fam.freqs_col + IN]
    low_in = jnp.sum(jnp.where(it == pos - 1, fr_in, 0), axis=1,
                     keepdims=True)
    ci_in = jnp.sum(jnp.where(it == pos, fr_in, 0), axis=1, keepdims=True)
    span_in = ci_in - low_in
    tot_in = in_scr[:, 0, fam.freqs_col + IN - 1 : fam.freqs_col + IN]

    low_b = jnp.zeros((LANES, 1), I32)
    ci_b = jnp.zeros((LANES, 1), I32)
    i128 = col_iota(128)
    for r in range(fam.big_nrows):
        idx = i128 + r * 128
        bf_r = big_scr[:, fam.big_freqs_row + r, :]
        low_b = low_b + jnp.sum(jnp.where(idx == pos - 1, bf_r, 0),
                                axis=1, keepdims=True)
        ci_b = ci_b + jnp.sum(jnp.where(idx == pos, bf_r, 0), axis=1,
                              keepdims=True)
    span_b = ci_b - low_b
    tot_b = big_scr[:, fam.big_freqs_row + fam.big_nrows - 1, 127:128]

    if nr2:
        low_g = jnp.zeros((LANES, 1), I32)
        ci_g = jnp.zeros((LANES, 1), I32)
        for r in range(nr2):
            idx = i128 + r * 128
            gf_r = hug_scr[:, 1 + nr2 + r, :]
            low_g = low_g + jnp.sum(jnp.where(idx == pos - 1, gf_r, 0),
                                    axis=1, keepdims=True)
            ci_g = ci_g + jnp.sum(jnp.where(idx == pos, gf_r, 0),
                                  axis=1, keepdims=True)
        span_g = ci_g - low_g
        tot_g = hug_scr[:, 2 * nr2, 127:128]

    H = hub_f.shape[1]
    ih = col_iota(H)
    low_h = jnp.sum(jnp.where(ih == pos - 1, hub_f, 0), axis=1,
                    keepdims=True)
    ci_h = jnp.sum(jnp.where(ih == pos, hub_f, 0), axis=1, keepdims=True)
    span_h = ci_h - low_h
    tot_h = hub_f[:, H - 1 : H]

    if nr2:
        low = jnp.where(v.is_hub, low_h,
                        jnp.where(v.is_big, low_b,
                                  jnp.where(v.is_huge, low_g, low_in)))
        span = jnp.where(v.is_hub, span_h,
                         jnp.where(v.is_big, span_b,
                                   jnp.where(v.is_huge, span_g, span_in)))
        tot = jnp.where(v.is_hub, tot_h,
                        jnp.where(v.is_big, tot_b,
                                  jnp.where(v.is_huge, tot_g, tot_in)))
    else:
        low = jnp.where(v.is_hub, low_h, jnp.where(v.is_big, low_b, low_in))
        span = jnp.where(v.is_hub, span_h,
                         jnp.where(v.is_big, span_b, span_in))
        tot = jnp.where(v.is_hub, tot_h, jnp.where(v.is_big, tot_b, tot_in))
    return low, span, tot


def row_decode_pos(fam: Family, v: RowView, value, in_scr, big_scr, hub_f,
                   hub_t, hug_scr=None, nr2=0):
    """Find the item whose cumulative interval contains ``value`` (u32
    [8,1]); returns (pos, tag, low, span) — the decode-side search
    (ac.c:167-179 over the throwaway model).

    With cumulative freq sections (see row_stats) the search needs NO
    per-row cumsum: live entries are strictly increasing, the tail
    carries the total, and a valid stream has value < total, so
    pos = #{j : C[j] <= value}; low/span are point reads at pos-1/pos.
    A corrupt stream (value >= total) counts every element and the
    masked reads yield 0s — garbage-safe like the old clamping."""
    IN = fam.inline_cap
    it = col_iota(IN)
    fr_in = in_scr[:, 0, fam.freqs_col : fam.freqs_col + IN]
    le_in = fr_in.astype(jnp.uint32) <= value
    pos_in = jnp.sum(le_in, axis=1, keepdims=True).astype(I32)
    tg_in = in_scr[:, 0, fam.tags_col : fam.tags_col + IN]
    tag_in = jnp.sum(jnp.where(it == pos_in, tg_in, 0), axis=1,
                     keepdims=True)
    low_in = jnp.sum(jnp.where(it == pos_in - 1, fr_in, 0), axis=1,
                     keepdims=True)
    ci_in = jnp.sum(jnp.where(it == pos_in, fr_in, 0), axis=1,
                    keepdims=True)
    span_in = ci_in - low_in

    NR = fam.big_nrows
    i128 = col_iota(128)
    cnt = jnp.zeros((LANES, 1), I32)
    for r in range(NR):
        bf_r = big_scr[:, fam.big_freqs_row + r, :]
        cnt = cnt + jnp.sum(
            (bf_r.astype(jnp.uint32) <= value).astype(I32), axis=1,
            keepdims=True,
        )
    pos_b = cnt
    tag_b = jnp.zeros((LANES, 1), I32)
    low_b = jnp.zeros((LANES, 1), I32)
    ci_b = jnp.zeros((LANES, 1), I32)
    for r in range(NR):
        idx = i128 + r * 128
        bf_r = big_scr[:, fam.big_freqs_row + r, :]
        bt_r = big_scr[:, fam.big_tags_row + r, :]
        tag_b = tag_b + jnp.sum(jnp.where(idx == pos_b, bt_r, 0), axis=1,
                                keepdims=True)
        low_b = low_b + jnp.sum(jnp.where(idx == pos_b - 1, bf_r, 0),
                                axis=1, keepdims=True)
        ci_b = ci_b + jnp.sum(jnp.where(idx == pos_b, bf_r, 0), axis=1,
                              keepdims=True)
    span_b = ci_b - low_b

    if nr2:
        cnt_g = jnp.zeros((LANES, 1), I32)
        for r in range(nr2):
            gf_r = hug_scr[:, 1 + nr2 + r, :]
            cnt_g = cnt_g + jnp.sum(
                (gf_r.astype(jnp.uint32) <= value).astype(I32), axis=1,
                keepdims=True,
            )
        pos_g = cnt_g
        tag_g = jnp.zeros((LANES, 1), I32)
        low_g = jnp.zeros((LANES, 1), I32)
        ci_g = jnp.zeros((LANES, 1), I32)
        for r in range(nr2):
            idx = i128 + r * 128
            gf_r = hug_scr[:, 1 + nr2 + r, :]
            gt_r = hug_scr[:, 1 + r, :]
            tag_g = tag_g + jnp.sum(jnp.where(idx == pos_g, gt_r, 0),
                                    axis=1, keepdims=True)
            low_g = low_g + jnp.sum(jnp.where(idx == pos_g - 1, gf_r, 0),
                                    axis=1, keepdims=True)
            ci_g = ci_g + jnp.sum(jnp.where(idx == pos_g, gf_r, 0),
                                  axis=1, keepdims=True)
        span_g = ci_g - low_g

    H = hub_f.shape[1]
    ih = col_iota(H)
    le_h = hub_f.astype(jnp.uint32) <= value
    pos_h = jnp.sum(le_h, axis=1, keepdims=True).astype(I32)
    tag_h = jnp.sum(jnp.where(ih == pos_h, hub_t, 0), axis=1, keepdims=True)
    low_h = jnp.sum(jnp.where(ih == pos_h - 1, hub_f, 0), axis=1,
                    keepdims=True)
    ci_h = jnp.sum(jnp.where(ih == pos_h, hub_f, 0), axis=1, keepdims=True)
    span_h = ci_h - low_h

    if nr2:
        pos = jnp.where(v.is_hub, pos_h,
                        jnp.where(v.is_big, pos_b,
                                  jnp.where(v.is_huge, pos_g, pos_in)))
        tag = jnp.where(v.is_hub, tag_h,
                        jnp.where(v.is_big, tag_b,
                                  jnp.where(v.is_huge, tag_g, tag_in)))
        low = jnp.where(v.is_hub, low_h,
                        jnp.where(v.is_big, low_b,
                                  jnp.where(v.is_huge, low_g, low_in)))
        span = jnp.where(v.is_hub, span_h,
                         jnp.where(v.is_big, span_b,
                                   jnp.where(v.is_huge, span_g, span_in)))
    else:
        pos = jnp.where(v.is_hub, pos_h, jnp.where(v.is_big, pos_b, pos_in))
        tag = jnp.where(v.is_hub, tag_h, jnp.where(v.is_big, tag_b, tag_in))
        low = jnp.where(v.is_hub, low_h, jnp.where(v.is_big, low_b, low_in))
        span = jnp.where(v.is_hub, span_h,
                         jnp.where(v.is_big, span_b, span_in))
    return pos, tag, low, span


def row_update(fam: Family, v: RowView, tag, found, pos, active,
               in_scr, big_scr, hub_t_ref, hub_f_ref, hub_p_ref,
               hub_n, hub_cap, promo_n, promo_cap, new_pair_id=None,
               hug_scr=None, nr2=0, m=0, huge_n=None, huge_cap=0,
               big_trig=None):
    """Post-event update (x3.c:197-209): bump the found item's freq or
    append (tag, 1[, pair_id]); promote a full inline row to a fresh big
    span, and (when the huge tier is compiled in, ``nr2 > 0``) a full big
    span to a fresh huge span.  Mutates the scratch refs and hub refs in
    place; returns (hub_n', promo_n', did_promo [8,1]b, span_idx [8,1],
    oflow [8,1]b, huge_n', did_promo2, huge_idx) — the last three are
    None when the tier is off."""
    IN = fam.inline_cap
    app = active & ~found
    inc = active & found
    # big-span index as encoded at entry (before any header rewrite):
    # valid for every lane that was big at view time
    idx_entry = -in_scr[:, 0, 0:1] - 1

    # ---- hub path (dense VMEM planes).  Freq planes are cumulative
    # with the tail-total invariant (row_stats): inc = suffix add from
    # pos; append = suffix add from hub_n (the tail already holds
    # C[n-1], so +1 lands the new item's C and the new total at once)
    H = hub_t_ref.shape[1]
    ih = col_iota(H)
    h_inc = v.is_hub & inc
    hub_f_ref[:, :] = hub_f_ref[:, :] + jnp.where(
        h_inc & (ih >= pos), 1, 0
    )
    hub_room = hub_n < hub_cap
    h_app = v.is_hub & app & hub_room
    at_end = ih == hub_n
    hub_t_ref[:, :] = jnp.where(h_app & at_end, tag, hub_t_ref[:, :])
    hub_f_ref[:, :] = hub_f_ref[:, :] + jnp.where(
        h_app & (ih >= hub_n), 1, 0
    )
    if new_pair_id is not None:
        hub_p_ref[:, :] = jnp.where(h_app & at_end, new_pair_id,
                                    hub_p_ref[:, :])
    hub_n2 = hub_n + jnp.where(h_app, 1, 0)
    oflow = v.is_hub & app & ~hub_room

    # ---- promotion: inline row full, this append needs a big span
    need = active & ~v.is_hub & ~v.is_big & app & (v.n >= IN)
    if nr2:
        need = need & ~v.is_huge
    can = promo_n < promo_cap
    do_promo = need & can
    oflow = oflow | (need & ~can)
    span_idx_new = promo_n
    it = col_iota(IN)
    pad = jnp.zeros((LANES, 128 - IN), I32)

    def padded(cols_base):
        sec = in_scr[:, 0, cols_base : cols_base + IN]
        return jnp.concatenate([sec, pad], axis=1)

    # header row: item count at col 0
    c0 = col_iota(128) == 0
    big_scr[:, 0, :] = jnp.where(
        do_promo & c0, v.n, big_scr[:, 0, :]
    )
    # first content row of each section gets the inline items; the rest
    # of the section is zeroed for promoting lanes — EXCEPT the
    # cumulative freq section, whose pad columns and tail rows must
    # carry the row TOTAL (= the full inline row's last cum value) to
    # keep the tail-total invariant (row_stats)
    for base_row, col_base in (
        ((fam.big_tags_row, fam.tags_col),)
        + (((fam.big_pairs_row, fam.pairs_col),)
           if fam.pairs_col is not None else ())
    ):
        big_scr[:, base_row, :] = jnp.where(
            do_promo, padded(col_base), big_scr[:, base_row, :]
        )
        for r in range(1, fam.big_nrows):
            big_scr[:, base_row + r, :] = jnp.where(
                do_promo, 0, big_scr[:, base_row + r, :]
            )
    tot_promo = in_scr[:, 0, fam.freqs_col + IN - 1 : fam.freqs_col + IN]
    fr0 = jnp.where(
        col_iota(128) < IN, padded(fam.freqs_col), tot_promo
    )
    big_scr[:, fam.big_freqs_row, :] = jnp.where(
        do_promo, fr0, big_scr[:, fam.big_freqs_row, :]
    )
    for r in range(1, fam.big_nrows):
        big_scr[:, fam.big_freqs_row + r, :] = jnp.where(
            do_promo, tot_promo, big_scr[:, fam.big_freqs_row + r, :]
        )
    # inline header now redirects to the span
    in_scr[:, 0, :] = jnp.where(
        do_promo & c0, -(span_idx_new + 1), in_scr[:, 0, :]
    )
    promo_n2 = promo_n + jnp.where(do_promo, 1, 0)

    big_now = v.is_big | do_promo

    # ---- promotion: big span at the trigger, this append needs a huge
    # span.  O(1): section rows copy across; remaining huge rows zeroed
    if nr2:
        trig = min(fam.big_cap, big_trig if big_trig else fam.big_cap)
        assert trig > IN and nr2 >= fam.big_nrows
        need2 = active & v.is_big & app & (v.n >= trig)
        can2 = huge_n < huge_cap
        do_promo2 = need2 & can2
        oflow = oflow | (need2 & ~can2)
        gidx_new = huge_n
        c0g = col_iota(128) == 0
        hug_scr[:, 0, :] = jnp.where(do_promo2 & c0g, v.n, hug_scr[:, 0, :])
        sections = [(fam.big_tags_row, 1)]
        if fam.pairs_col is not None:
            sections.append((fam.big_pairs_row, 1 + 2 * nr2))
        for b_base, g_base in sections:
            for r in range(fam.big_nrows):
                hug_scr[:, g_base + r, :] = jnp.where(
                    do_promo2, big_scr[:, b_base + r, :],
                    hug_scr[:, g_base + r, :],
                )
            for r in range(fam.big_nrows, nr2):
                hug_scr[:, g_base + r, :] = jnp.where(
                    do_promo2, 0, hug_scr[:, g_base + r, :]
                )
        # cumulative freq section: rows copy verbatim; tail rows carry
        # the span total (big's last freq element), not zeros
        tot2 = big_scr[:, fam.big_freqs_row + fam.big_nrows - 1, 127:128]
        for r in range(fam.big_nrows):
            hug_scr[:, 1 + nr2 + r, :] = jnp.where(
                do_promo2, big_scr[:, fam.big_freqs_row + r, :],
                hug_scr[:, 1 + nr2 + r, :],
            )
        for r in range(fam.big_nrows, nr2):
            hug_scr[:, 1 + nr2 + r, :] = jnp.where(
                do_promo2, tot2, hug_scr[:, 1 + nr2 + r, :]
            )
        in_scr[:, 0, :] = jnp.where(
            do_promo2 & c0g, -(m + gidx_new + 1), in_scr[:, 0, :]
        )
        huge_n2 = huge_n + jnp.where(do_promo2, 1, 0)
        huge_now = v.is_huge | do_promo2
    else:
        do_promo2 = None
        huge_n2 = None
        huge_now = None

    # ---- inline path
    ido = active & ~v.is_hub & ~big_now
    if nr2:
        ido = ido & ~v.is_huge
    fc = col_iota(128)
    # cumulative freqs: suffix adds bounded to the freq section
    in_f = (fc >= fam.freqs_col) & (fc < fam.freqs_col + IN)
    in_scr[:, 0, :] = in_scr[:, 0, :] + jnp.where(
        (ido & inc) & in_f & (fc >= fam.freqs_col + pos), 1, 0
    )
    i_app = ido & app  # v.n < IN guaranteed (promotion above)
    in_scr[:, 0, :] = jnp.where(
        i_app & (fc == fam.tags_col + v.n), tag, in_scr[:, 0, :]
    )
    in_scr[:, 0, :] = in_scr[:, 0, :] + jnp.where(
        i_app & in_f & (fc >= fam.freqs_col + v.n), 1, 0
    )
    if new_pair_id is not None:
        in_scr[:, 0, :] = jnp.where(
            i_app & (fc == fam.pairs_col + v.n), new_pair_id,
            in_scr[:, 0, :]
        )
    in_scr[:, 0, :] = jnp.where(
        i_app & (fc == 0), v.n + 1, in_scr[:, 0, :]
    )

    # ---- big path (per-row 2-D unroll; see the rank note up top)
    NR = fam.big_nrows
    i128 = col_iota(128)
    bdo = active & ~v.is_hub & big_now
    if nr2:
        bdo = bdo & ~huge_now
        big_room = v.n < trig   # at the trigger the append promotes
    else:
        big_room = v.n < fam.big_cap
        oflow = oflow | (bdo & app & ~big_room)
    b_inc = bdo & inc
    b_app = bdo & app & big_room
    for r in range(NR):
        idx = i128 + r * 128
        fr_row = fam.big_freqs_row + r
        big_scr[:, fr_row, :] = big_scr[:, fr_row, :] + jnp.where(
            b_inc & (idx >= pos), 1, 0
        )
        at_r = b_app & (idx == v.n)
        bt_row = fam.big_tags_row + r
        big_scr[:, bt_row, :] = jnp.where(at_r, tag, big_scr[:, bt_row, :])
        big_scr[:, fr_row, :] = big_scr[:, fr_row, :] + jnp.where(
            b_app & (idx >= v.n), 1, 0
        )
        if new_pair_id is not None:
            bp_row = fam.big_pairs_row + r
            big_scr[:, bp_row, :] = jnp.where(
                at_r, new_pair_id, big_scr[:, bp_row, :]
            )
    big_scr[:, 0, :] = jnp.where(
        b_app & c0, v.n + 1, big_scr[:, 0, :]
    )

    if not nr2:
        span_idx = jnp.where(do_promo, span_idx_new,
                             -in_scr[:, 0, 0:1] - 1)
        return hub_n2, promo_n2, do_promo, span_idx, oflow, None, None, None

    # ---- huge path (same per-row unroll over nr2 rows per section)
    gdo = active & ~v.is_hub & huge_now
    g_inc = gdo & inc
    g_room = v.n < nr2 * 128
    g_app = gdo & app & g_room
    oflow = oflow | (gdo & app & ~g_room)
    for r in range(nr2):
        idx = i128 + r * 128
        fr_row = 1 + nr2 + r
        hug_scr[:, fr_row, :] = hug_scr[:, fr_row, :] + jnp.where(
            g_inc & (idx >= pos), 1, 0
        )
        at_r = g_app & (idx == v.n)
        hug_scr[:, 1 + r, :] = jnp.where(at_r, tag, hug_scr[:, 1 + r, :])
        hug_scr[:, fr_row, :] = hug_scr[:, fr_row, :] + jnp.where(
            g_app & (idx >= v.n), 1, 0
        )
        if new_pair_id is not None:
            gp_row = 1 + 2 * nr2 + r
            hug_scr[:, gp_row, :] = jnp.where(
                at_r, new_pair_id, hug_scr[:, gp_row, :]
            )
    hug_scr[:, 0, :] = jnp.where(g_app & c0g, v.n + 1, hug_scr[:, 0, :])

    # span_idx stays the ENTRY big index for lanes that were big (a
    # promo2 lane's harmless big write-back must target its old slot,
    # not the rewritten huge header); huge_idx covers the huge tier
    span_idx = jnp.where(do_promo, span_idx_new, idx_entry)
    huge_idx = jnp.where(do_promo2, gidx_new, idx_entry - m)
    return (hub_n2, promo_n2, do_promo, span_idx, oflow,
            huge_n2, do_promo2, huge_idx)
