"""Fused Pallas matcher: one kernel per event step.

Computes, for all L lanes at once, everything the encoder's match stage
needs (x3.c:381-383, backend.c:56-100, dict.c:105-157):

  * longest-prefix dictionary probe at p with per-entry shared-prefix
    lengths kept resident for the exact-duplicate query,
  * the forward-window repeated-prefix scan (running prefix-AND over 32
    shifted compares of the DMA'd window),
  * the threshold sweep as argmax over (level, i) keys with the
    magic-factor veto loop inline (veto probes reuse the resident window
    and dictionary -- VPU compares only, no extra HBM traffic),
  * the hit/miss decision, fragment length clamp and duplicate check.

Layout strategy for Mosaic: fragment bytes are pre-packed into 8 LE u32
words per entry ([L, D, 32] u8 -> [L, 8, D] i32, word-major), so every
probe is eight 2-D [L, D] word compares (prefix length = word-equality run
+ mask-based byte refinement of the first differing word) -- no 3-D i8
broadcasts, no integer argmax, 4x fewer compare lanes than byte-wise.

Replaces ~200 small XLA ops per event (gathers, 32 scan steps, reductions,
the veto while_loop with its own gathers/probes) with a single launch.
The XLA fallback (ops/match.py) computes identical results and is
differentially tested against this kernel in interpreter mode
(tests/test_match_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from x3tpu.config import MAX_MATCH_LEN, X3Params

I32 = jnp.int32
U8 = jnp.uint8
NWORDS = MAX_MATCH_LEN // 4  # 8 packed u32 words per fragment


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def pack_fragments(strs: jax.Array):
    """[L, D, 32] u8 -> tuple of 8 [L, D] i32 word planes (LE words; one
    kernel input per word so nothing slices a tiled dim)."""
    L, D, _ = strs.shape
    w = jax.lax.bitcast_convert_type(
        strs.reshape(L, D, NWORDS, 4), jnp.int32
    )  # [L, D, 8]
    return tuple(w[:, :, i] for i in range(NWORDS))


def _byte_refine(xw: jax.Array) -> jax.Array:
    """#(leading zero bytes) of each LE u32 xor in [0, 3] (callers handle
    the all-equal case separately)."""
    b0 = (xw & 0xFF) == 0
    b1 = (xw & 0xFFFF) == 0
    b2 = (xw & 0xFFFFFF) == 0
    return b0.astype(I32) + (b0 & b1).astype(I32) + (b0 & b1 & b2).astype(I32)


def _probe_matchlen(strs_words, tpk):
    """Per-entry shared-prefix length [L, D]; ``strs_words`` is the list of
    8 [L, D] word-plane refs, ``tpk`` a list of 8 [L, 1] target words."""
    L, D = strs_words[0].shape
    run = jnp.ones((L, D), jnp.bool_)
    words = jnp.zeros((L, D), I32)   # shared length in whole words
    xw_sel = jnp.zeros((L, D), I32)  # first differing word's xor
    for w in range(NWORDS):
        sw = strs_words[w][:, :]
        tw = tpk[w]
        eq = sw == tw
        first_diff_here = run & ~eq
        xw_sel = jnp.where(first_diff_here, sw ^ tw, xw_sel)
        run = run & eq
        words = words + run.astype(I32)
    return jnp.minimum(
        words * 4 + jnp.where(xw_sel != 0, _byte_refine(xw_sel), 0),
        MAX_MATCH_LEN,
    )


def _probe_best_len(strs_words, lens_ref, n, tpk):
    """Best matching entry length [L, 1] for the veto probes."""
    L, D = strs_words[0].shape
    mlen = _probe_matchlen(strs_words, tpk)
    lens = lens_ref[:, :]
    slot_iota = jax.lax.broadcasted_iota(I32, (L, D), 1)
    ok = (slot_iota < n) & (lens > 0) & (mlen >= lens)
    return jnp.max(jnp.where(ok, lens, 0), axis=1, keepdims=True)


def _pack_from_window(win: jax.Array, start: int):
    """Pack win[:, start:start+32] (i32 bytes) into a list of 8 [L, 1] LE
    words using only 2-D slices and shifts (static ``start``)."""
    cols = []
    for j in range(NWORDS):
        o = start + 4 * j
        wv = (
            win[:, o : o + 1]
            | (win[:, o + 1 : o + 2] << 8)
            | (win[:, o + 2 : o + 3] << 16)
            | (win[:, o + 3 : o + 4] << 24)
        )
        cols.append(wv)
    return cols


def _pack_from_values(sel: jax.Array):
    """Pack a [L, 32] i32 byte matrix into 8 [L, 1] LE words."""
    return _pack_from_window(sel, 0)


def _matcher_kernel(
    # inputs
    win_ref, rem_ref,
    sw0, sw1, sw2, sw3, sw4, sw5, sw6, sw7,
    lens_ref, n_ref,
    # outputs
    hit_ref, slot_ref, dlen_ref, fbm_ref, mlen_ref, dup_ref,
    # scratch
    res_scr, rem_scr,
    *, W, Wbuf, D, L, params: X3Params,
):
    strs_words = (sw0, sw1, sw2, sw3, sw4, sw5, sw6, sw7)
    # i8 vector compares are unsupported on this target: widen once
    win = win_ref[:, :].astype(I32)  # [L, Wbuf] (window at p, XLA-gathered)
    n = n_ref[:, :]          # [L, 1]
    rem = rem_ref[:, :]      # [L, 1] = tlen - p

    # ---- dictionary probe at p (dict.c:105-130)
    tpk = _pack_from_window(win, 0)
    probe_mlen = _probe_matchlen(strs_words, tpk)     # [L, D]
    slot_iota = jax.lax.broadcasted_iota(I32, (L, D), 1)
    valid = slot_iota < n
    all_lens = lens_ref[:, :]
    ok = valid & (all_lens > 0) & (probe_mlen >= all_lens)
    cand = jnp.where(ok, all_lens, 0)
    dlen = jnp.max(cand, axis=1, keepdims=True)
    slot = jnp.min(
        jnp.where((cand == dlen) & (dlen > 0), slot_iota, D), axis=1,
        keepdims=True,
    )
    slot = jnp.where(slot == D, 0, slot)

    # ---- window scan (backend.c:66-74)
    S = W - MAX_MATCH_LEN - 1
    iota32 = jax.lax.broadcasted_iota(I32, (L, MAX_MATCH_LEN), 1)
    if S > 0:
        run = jnp.ones((L, S), jnp.bool_)
        cols = []
        for i in range(MAX_MATCH_LEN):
            run = run & (win[:, 1 + i : 1 + i + S] == win[:, i : i + 1])
            cols.append(jnp.sum(run.astype(I32), axis=1, keepdims=True))
        counts = jnp.concatenate(cols, axis=1)  # [L, 32]
    else:
        counts = jnp.zeros((L, MAX_MATCH_LEN), I32)

    # ---- threshold sweep with magic-factor vetoes (backend.c:76-97)
    T = params.max_match_count
    f1, f2 = params.magic_factor1, params.magic_factor2
    if T < 1:
        fbm = jnp.ones((L, 1), I32)
    elif f1 == 0 and f2 == 0:
        cand0 = counts >= 2
        level = jnp.minimum(counts - 1, T)
        key = jnp.where(cand0, level * MAX_MATCH_LEN + iota32, -1)
        has = jnp.any(cand0, axis=1, keepdims=True)
        kmax = jnp.max(key, axis=1, keepdims=True)
        best_i = jnp.max(
            jnp.where(key == kmax, iota32, -1), axis=1, keepdims=True
        )
        fbm = jnp.where(has, best_i + 1, 1)
    else:
        cand0 = counts >= 2
        level = jnp.minimum(counts - 1, T)

        def select_tpk(bi):
            # select win[bi:bi+32] via 32 masked [L,32] selects, then pack
            sel = jnp.zeros((L, MAX_MATCH_LEN), I32)
            for i in range(MAX_MATCH_LEN):
                sel = jnp.where(bi == i, win[:, i : i + MAX_MATCH_LEN], sel)
            return _pack_from_values(sel)

        # sweep state lives in scratch refs: Mosaic cannot legalize
        # while_loops with vector carries, so this is a fixed fori over
        # at most 32 rounds, each round guarded by pl.when so resolved
        # states skip the probe work.
        res_scr[:, :] = jnp.zeros((L, 1), I32)
        rem_scr[:, :] = cand0.astype(I32)

        def round_body(it, _):
            result = res_scr[:, :]
            pred = jnp.any(result == 0)

            @pl.when(pred)
            def _():
                result = res_scr[:, :]
                remaining = rem_scr[:, :] != 0
                unresolved = result == 0
                key = jnp.where(remaining, level * MAX_MATCH_LEN + iota32, -1)
                has = jnp.any(remaining, axis=1, keepdims=True)
                kmax = jnp.max(key, axis=1, keepdims=True)
                bi = jnp.max(
                    jnp.where(key == kmax, iota32, -1), axis=1, keepdims=True
                )
                bi = jnp.maximum(bi, 0)
                result = jnp.where(unresolved & ~has, 1, result)
                pending = unresolved & has
                vetoed = jnp.zeros((L, 1), jnp.bool_)
                if f1 > 0:
                    vl = _probe_best_len(
                        strs_words, lens_ref, n, select_tpk(bi)
                    )
                    vetoed = vetoed | (
                        pending & (bi >= 2) & (vl > 0) & (vl * f1 > bi + 1)
                    )
                if f2 > 0:
                    veto2 = jnp.zeros((L, 1), jnp.bool_)
                    for o in range(1, MAX_MATCH_LEN):
                        vl_o = _probe_best_len(
                            strs_words, lens_ref, n,
                            _pack_from_window(win, o),
                        )
                        veto2 = veto2 | (
                            (o <= bi) & (vl_o > 0) & ((vl_o - o) * f2 > bi + 1)
                        )
                    vetoed = vetoed | (pending & (bi >= 1) & veto2)
                result = jnp.where(pending & ~vetoed, bi + 1, result)
                clear = vetoed & (iota32 == bi)
                res_scr[:, :] = result
                rem_scr[:, :] = (remaining & ~clear).astype(I32)

            return 0

        jax.lax.fori_loop(0, MAX_MATCH_LEN, round_body, 0)
        fbm = res_scr[:, :]

    # ---- decision (x3.c:381-404)
    if params.nl_remap:
        nl = jnp.where(
            dlen == 1, 1,
            jnp.where(dlen == 2, 4,
                      jnp.where(dlen == 3, 6,
                                jnp.where(dlen == 4, 8, 9999))),
        )
        nl = jnp.where(dlen == 0, 0, nl)
    else:
        nl = dlen
    found = dlen > 0
    hit = found & (nl >= fbm) & (dlen <= rem)
    mlen = jnp.clip(jnp.minimum(fbm, rem), 1, MAX_MATCH_LEN)
    dup = jnp.any(
        valid & (all_lens == mlen) & (probe_mlen >= mlen),
        axis=1, keepdims=True,
    )

    hit_ref[:, :] = hit.astype(I32)
    slot_ref[:, :] = slot
    dlen_ref[:, :] = dlen
    fbm_ref[:, :] = fbm
    mlen_ref[:, :] = mlen
    dup_ref[:, :] = dup.astype(I32)


def match_event_pallas(
    text: jax.Array,      # u8 [L, TB] (stays in HBM)
    p: jax.Array,         # i32 [L]
    tlen: jax.Array,      # i32 [L]
    d_strs: jax.Array,    # u8 [L, D, 32]
    d_lens: jax.Array,    # i32 [L, D]
    d_n: jax.Array,       # i32 [L]
    params: X3Params,
    interpret: bool = False,
):
    """Returns (hit, slot, dlen, fbm, mlen, dup) -- [L] bool/i32."""
    L, TB = text.shape
    D = d_strs.shape[1]
    W = max(params.window, MAX_MATCH_LEN)
    Wbuf = _round_up(max(W, 2 * MAX_MATCH_LEN) + MAX_MATCH_LEN, 128)
    assert TB >= Wbuf, f"text width {TB} < window buffer {Wbuf}"

    strs_words = pack_fragments(d_strs)  # 8 x [L, D] i32 (one XLA bitcast)
    # window gathered XLA-side (one dynamic-gather op); everything else
    # runs in the kernel out of VMEM
    idx = p[:, None].astype(I32) + jnp.arange(Wbuf, dtype=I32)[None, :]
    win = jnp.take_along_axis(text, idx, axis=1)
    rem = (tlen - p).astype(I32)[:, None]

    kernel = functools.partial(
        _matcher_kernel, W=W, Wbuf=Wbuf, D=D, L=L, params=params
    )
    out_shape = [jax.ShapeDtypeStruct((L, 1), I32) for _ in range(6)]
    hit, slot, dlen, fbm, mlen, dup = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (NWORDS + 4),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(6)],
        scratch_shapes=[
            pltpu.VMEM((L, 1), I32),
            pltpu.VMEM((L, MAX_MATCH_LEN), I32),
        ],
        interpret=interpret,
    )(
        win,
        rem,
        *strs_words,
        d_lens,
        d_n.astype(I32)[:, None],
    )
    return (
        hit[:, 0] != 0,
        slot[:, 0],
        dlen[:, 0],
        fbm[:, 0],
        mlen[:, 0],
        dup[:, 0] != 0,
    )
