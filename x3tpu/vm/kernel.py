"""The codec-VM encoder kernel: the whole x3 event loop in one Pallas
program.

One kernel launch runs up to ``nsteps`` events for every lane of a group
(8 lanes; groups are sequential grid steps), with all adaptive state
resident in VMEM or fetched per event by row DMA — removing the ~450
us/event op-dispatch floor of the XLA while-loop path (round-1 ablation,
BENCH_NOTES.md).  Semantics are exactly the reference encoder's
(x3.c:372-434) as already modeled by x3tpu/codec.py:_enc_body; every
section below cites the XLA twin it must stay bit-identical to.

Per-event phases (DMA-overlapped):
  A  text-segment refill (byte-per-i32 rows; amortized ~1/100 events)
  B  start ctx1 row DMAs for (prev_c1, c1)       [x3.c:139-147]
  C  window barrel-shift extraction
  D  dictionary probe + window scan              [dict.c:105, backend.c:66]
  E  promoted-span DMAs; pair lookup -> cid0; start ctx0 row DMA
  F  threshold sweep + magic-factor vetoes       [backend.c:76-97]
  G  mode stats + selection                      [x3.c:150-172]
  H  AC: event symbol, payload, literal bytes    [x3.c:176-190, 263-267]
  I  dictionary MTF / insert                     [dict.c:132, x3.c:411-420]
  J  context updates + pair registration         [x3.c:195-222]
  K  row write-backs, sink flush, advance
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from x3tpu.config import (
    E_CTX0, E_CTX1, E_EOF, E_IDX1, E_NEW, MAX_MATCH_LEN, X3Params,
)
from x3tpu.vm import prims
from x3tpu.vm import rows as rw
from x3tpu.vm.config import (
    FLUSH_WORDS, LANES, OF_CTX0, OF_CTX1, OF_DICT, OF_OUT, OF_PAIRS, PB,
    R_AC_HIGH, R_AC_LOW, R_AC_SCALE, R_C1, R_COUNTS, R_DICT_N, R_HUB0_N,
    R_HUB1_N, R_HUGE0_N, R_HUGE1_N, R_NBITS, R_OFLOW, R_P, R_PAIR_N,
    R_PREV_C1, R_PROMO0_N, R_PROMO1_N, R_SEG_BASE, R_TLEN, R_WIN_BASE,
    VMCaps,
)
from x3tpu.vm.prims import col_iota, get_col, set_col, vmem_compiler_params

I32 = jnp.int32
U32 = jnp.uint32
F32 = jnp.float32
L = LANES
MML = MAX_MATCH_LEN

# xfer scratch columns (vector -> scalar handoffs for DMA addressing)
XC_NEED, XC_ROW0, XC_RPREV, XC_RCUR, XC_BPREV, XC_BCUR = 0, 1, 2, 3, 4, 5
XC_RC0, XC_BC0 = 6, 7
XC_WB1R, XC_WB1B, XC_WB1S, XC_WB0R, XC_WB0B, XC_WB0S = 8, 9, 10, 11, 12, 13
XC_FLUSH, XC_FROW = 14, 15
# huge-tier columns (only written when the tier is compiled in)
XC_GPREV, XC_GCUR, XC_GC0 = 16, 17, 18
XC_WB1G, XC_WB1GS, XC_WB0G, XC_WB0GS = 19, 20, 21, 22
# acw scratch columns (AC state bridge across the literal while-loop)
AC_LOW, AC_HIGH, AC_SCALE, AC_NBITS, AC_OFLOW = 0, 1, 2, 3, 4


def _seg_rows(vc: VMCaps) -> int:
    return vc.wbuf // 128 + 6


def _pack_words(win):
    """win[:, :32] i32 bytes -> list of 8 LE-u32 words as [8,1] i32."""
    out = []
    for w in range(8):
        o = 4 * w
        out.append(
            win[:, o : o + 1]
            | (win[:, o + 1 : o + 2] << 8)
            | (win[:, o + 2 : o + 3] << 16)
            | (win[:, o + 3 : o + 4] << 24)
        )
    return out


def _byte_refine(xw):
    """#leading zero bytes of an LE-u32 xor, in [0, 3]."""
    b0 = (xw & 0xFF) == 0
    b1 = (xw & 0xFFFF) == 0
    b2 = (xw & 0xFFFFFF) == 0
    return b0.astype(I32) + (b0 & b1).astype(I32) + (b0 & b1 & b2).astype(I32)


def _probe_matchlen(dictw, tw, D):
    """Shared-prefix length [8, D] of the target words ``tw`` against every
    entry (dict.c:105-130, word-packed)."""
    run = jnp.ones((L, D), jnp.bool_)
    words = jnp.zeros((L, D), I32)
    xw_sel = jnp.zeros((L, D), I32)
    for w in range(8):
        sw = dictw[:, w * D : (w + 1) * D]
        eq = sw == tw[w]
        first_diff = run & ~eq
        xw_sel = jnp.where(first_diff, sw ^ tw[w], xw_sel)
        run = run & eq
        words = words + run.astype(I32)
    return jnp.minimum(
        words * 4 + jnp.where(xw_sel != 0, _byte_refine(xw_sel), 0), MML
    )


def _probe(dictw, dlens, d_n, tw, D):
    """Longest-prefix probe: (found, slot, dlen, matchlen[8,D])."""
    mlen = _probe_matchlen(dictw, tw, D)
    iota = col_iota(D)
    valid = iota < d_n
    ok = valid & (dlens > 0) & (mlen >= dlens)
    cand = jnp.where(ok, dlens, 0)
    dlen = jnp.max(cand, axis=1, keepdims=True)
    slot = jnp.min(
        jnp.where((cand == dlen) & (dlen > 0), iota, D), axis=1,
        keepdims=True,
    )
    slot = jnp.where(slot == D, 0, slot)
    return dlen > 0, slot, dlen, mlen


def _probe_best_len(dictw, dlens, d_n, tw, D):
    mlen = _probe_matchlen(dictw, tw, D)
    iota = col_iota(D)
    ok = (iota < d_n) & (dlens > 0) & (mlen >= dlens)
    return jnp.max(jnp.where(ok, dlens, 0), axis=1, keepdims=True)


def _select32(win, bi):
    """win[:, bi:bi+32] per lane for bi in [0, 32) (masked selects)."""
    sel = jnp.zeros((L, MML), I32)
    for i in range(MML):
        sel = jnp.where(bi == i, win[:, i : i + MML], sel)
    return sel


def _onehot_add(vec, idx, amount, width):
    return vec + jnp.where(col_iota(width) == idx, amount, 0)


def _model_stats(freqs, sym, width):
    """(low, span, total) of an adaptive model row (ops/ac.py models)."""
    iota = col_iota(width)
    low = jnp.sum(jnp.where(iota < sym, freqs, 0), axis=1, keepdims=True)
    span = jnp.sum(jnp.where(iota == sym, freqs, 0), axis=1, keepdims=True)
    tot = jnp.sum(freqs, axis=1, keepdims=True)
    return low, span, tot


def _fprob(span, total):
    return span.astype(F32) / jnp.maximum(total, 1).astype(F32)


def encoder_kernel(
    # inputs
    text32, dictw_i, dlens_i, drank_i, dtago_i, ixf_i,
    h0t_i, h0f_i, h1t_i, h1f_i, h1p_i, ev_i, ms_i, ch_i,
    regsi_i, regsf_i, sinkw_i,
    outw_i, c0r_i, c1r_i,
    # outputs (aliased with inputs 1..19)
    dictw, dlens, drank, dtago, ixf,
    h0t, h0f, h1t, h1f, h1p, ev, ms, ch,
    regsi, regsf, sinkw,
    outw, c0r, c1r,
    # scratch
    tseg, seg32, c0in, c0big, c1pin, c1pbig, c1cin, c1cbig,
    c0hug, c1phug, c1chug,
    stage, rem_scr, res_scr, xfer, acw, acwf,
    sem_seg, sem_row, sem_wb, sem_out,
    *, vc: VMCaps, params: X3Params, nsteps: int, trows: int, orows: int,
    ablate: frozenset = frozenset(),
):
    g = pl.program_id(0)
    D = vc.dict_cap
    WBUF = vc.wbuf
    SR = _seg_rows(vc)
    SRB = SR * 128
    W2 = 2 * FLUSH_WORDS
    S0, S1 = vc.s0, vc.s1
    R0, R1 = vc.r0, vc.r1
    SCAN = params.window - MML - 1
    SCANP = max((SCAN + 127) // 128 * 128, 128)
    # huge tier (statics; when a family's tier is off its hug scratch is a
    # 1-row dummy and the rows functions compile the 3-tier code exactly)
    NR2_0, NR2_1 = vc.nr2_0, vc.nr2_1
    PB2_0, PB2_1 = vc.pb2_0, vc.pb2_1
    HB0, HB1 = vc.hug0_base, vc.hug1_base
    c0hug_a = c0hug if NR2_0 else None
    c1phug_a = c1phug if NR2_1 else None
    c1chug_a = c1chug if NR2_1 else None
    # perf-ablation gates (hardware budget dissection ONLY -- any non-empty
    # ablate set produces WRONG output; see experiments/hw_vm_ablate.py)
    DO_DMA = "nodma" not in ablate
    ac_step = (lambda st, *a: st) if "noac" in ablate else prims.ac_encode

    # ---- copy carried VMEM state into the (aliased) output blocks; all
    # further access goes through the out refs
    for a, b in (
        (dictw_i, dictw), (dlens_i, dlens), (drank_i, drank),
        (dtago_i, dtago), (ixf_i, ixf), (h0t_i, h0t), (h0f_i, h0f),
        (h1t_i, h1t), (h1f_i, h1f), (h1p_i, h1p), (ev_i, ev), (ms_i, ms),
        (ch_i, ch), (regsf_i, regsf), (sinkw_i, sinkw),
    ):
        b[:, :] = a[:, :]
    # invalidate the (scratch) text segment at launch entry
    regsi[:, :] = set_col(regsi_i[:, :], R_SEG_BASE, jnp.full((L, 1), -(1 << 20), I32))

    iota128 = col_iota(128)
    iotaD = col_iota(D)
    iota32c = col_iota(MML)

    def lane_rowbase(l, rper):
        return (g * L + l) * rper

    # ---- pre-loop: prime the prev-ctx1 row cache.  The event loop never
    # fetches the prev row from HBM: after a hit the (updated) cur row
    # scratch is swapped into the prev scratch — they are the same context
    # (x3.c:406: prev_context1 = context1) — and after a miss prev becomes
    # the hub.  Only the first event of a launch needs the HBM copy.
    # (probe9 cost model: a gated-out per-lane DMA region costs ~0.5 us;
    # dropping two per-event slots saves ~8 us/event-group.)
    if DO_DMA:
        R0v = regsi[:, :]
        prev0 = get_col(R0v, R_PREV_C1)
        act0 = get_col(R0v, R_P) < get_col(R0v, R_TLEN)
        rp0 = jnp.where(act0 & (prev0 >= 1), prev0 - 1, -1)
        xfer[:, :] = set_col(jnp.zeros((L, 128), I32), XC_RPREV, rp0)
        for l in range(L):
            @pl.when(xfer[l, XC_RPREV] >= 0)
            def _(l=l):
                r = lane_rowbase(l, R1) + xfer[l, XC_RPREV]
                pltpu.make_async_copy(
                    c1r.at[pl.ds(r, 1), :], c1pin.at[l], sem_row.at[l, 0]
                ).start()
        for l in range(L):
            @pl.when(xfer[l, XC_RPREV] >= 0)
            def _(l=l):
                r = lane_rowbase(l, R1) + xfer[l, XC_RPREV]
                pltpu.make_async_copy(
                    c1r.at[pl.ds(r, 1), :], c1pin.at[l], sem_row.at[l, 0]
                ).wait()
        hp0 = c1pin[:, 0, 0:1]
        idxp0 = -hp0 - 1
        neg0 = (rp0 >= 0) & (hp0 < 0)
        if NR2_1:
            bp0 = jnp.where(neg0 & (idxp0 < vc.m1), idxp0, -1)
            gp0 = jnp.where(neg0 & (idxp0 >= vc.m1), idxp0 - vc.m1, -1)
        else:
            bp0 = jnp.where(neg0, idxp0, -1)
            gp0 = None
        xfer[:, :] = set_col(xfer[:, :], XC_BPREV, bp0)

        @pl.when(jnp.any(bp0 >= 0))
        def _():
            for l in range(L):
                @pl.when(xfer[l, XC_BPREV] >= 0)
                def _(l=l):
                    r = lane_rowbase(l, R1) + S1 + xfer[l, XC_BPREV] * PB
                    pltpu.make_async_copy(
                        c1r.at[pl.ds(r, PB), :], c1pbig.at[l],
                        sem_row.at[l, 2],
                    ).start()
            for l in range(L):
                @pl.when(xfer[l, XC_BPREV] >= 0)
                def _(l=l):
                    r = lane_rowbase(l, R1) + S1 + xfer[l, XC_BPREV] * PB
                    pltpu.make_async_copy(
                        c1r.at[pl.ds(r, PB), :], c1pbig.at[l],
                        sem_row.at[l, 2],
                    ).wait()

        if NR2_1:
            xfer[:, :] = set_col(xfer[:, :], XC_GPREV, gp0)

            @pl.when(jnp.any(gp0 >= 0))
            def _():
                for l in range(L):
                    @pl.when(xfer[l, XC_GPREV] >= 0)
                    def _(l=l):
                        r = (lane_rowbase(l, R1) + S1 + HB1
                             + xfer[l, XC_GPREV] * PB2_1)
                        pltpu.make_async_copy(
                            c1r.at[pl.ds(r, PB2_1), :], c1phug.at[l],
                            sem_row.at[l, 8],
                        ).start()
                for l in range(L):
                    @pl.when(xfer[l, XC_GPREV] >= 0)
                    def _(l=l):
                        r = (lane_rowbase(l, R1) + S1 + HB1
                             + xfer[l, XC_GPREV] * PB2_1)
                        pltpu.make_async_copy(
                            c1r.at[pl.ds(r, PB2_1), :], c1phug.at[l],
                            sem_row.at[l, 8],
                        ).wait()

    def event_body(carry):
        step, _alive = carry
        R = regsi[:, :]
        p = get_col(R, R_P)
        tlen = get_col(R, R_TLEN)
        active = p < tlen

        # ================= A: text segment refill =================
        row0_old = get_col(R, R_SEG_BASE)
        off_cur = p - row0_old * 128
        need = active & ((off_cur < 0) | (off_cur + WBUF > SRB))
        row0 = jnp.where(need, p >> 7, row0_old)
        xfer[:, :] = set_col(
            set_col(xfer[:, :], XC_NEED, need.astype(I32)), XC_ROW0, row0
        )
        # refill is ~1/100 events: ONE scalar gate around the whole phase
        # (a gated-out per-lane DMA region still costs ~0.5 us, probe9)
        @pl.when(jnp.any(need))
        def _():
            for l in range(L):
                @pl.when(xfer[l, XC_NEED] != 0)
                def _(l=l):
                    r0 = lane_rowbase(l, trows) + xfer[l, XC_ROW0]
                    pltpu.make_async_copy(
                        text32.at[pl.ds(r0, SR), :], tseg.at[l],
                        sem_seg.at[l],
                    ).start()
            for l in range(L):
                @pl.when(xfer[l, XC_NEED] != 0)
                def _(l=l):
                    r0 = lane_rowbase(l, trows) + xfer[l, XC_ROW0]
                    pltpu.make_async_copy(
                        text32.at[pl.ds(r0, SR), :], tseg.at[l],
                        sem_seg.at[l],
                    ).wait()
            for r in range(SR):
                cols = slice(r * 128, (r + 1) * 128)
                seg32[:, cols] = jnp.where(need, tseg[:, r, :], seg32[:, cols])

        # ================= B: start ctx1 cur row DMA =================
        # (the prev row is never fetched in-loop: c1pin/c1pbig hold it —
        # primed before the loop, swapped from the cur row after each hit)
        prev_c1 = get_col(R, R_PREV_C1)
        c1 = get_col(R, R_C1)
        rcur = jnp.where(active & (c1 >= 1), c1 - 1, -1)
        # unconditional fetch, row clamped to 0: a stray read into the
        # scratch of a hub/inactive lane is masked out downstream, and an
        # ungated DMA is cheaper than a gated-out one (probe9)
        xfer[:, :] = set_col(xfer[:, :], XC_RCUR, jnp.maximum(rcur, 0))
        if DO_DMA:
            for l in range(L):
                r = lane_rowbase(l, R1) + xfer[l, XC_RCUR]
                pltpu.make_async_copy(
                    c1r.at[pl.ds(r, 1), :], c1cin.at[l], sem_row.at[l, 1]
                ).start()

        # ================= C: window extraction =================
        off = p - row0 * 128
        x = seg32[:, :]
        for b in range(10):
            bit = (off >> b) & 1
            rolled = pltpu.roll(x, SRB - (1 << b), axis=1)
            x = jnp.where(bit == 1, rolled, x)
        win = x[:, :WBUF]

        # ================= D: dict probe + window scan =================
        tw = _pack_words(win)
        d_n = get_col(R, R_DICT_N)
        dictw_v = dictw[:, :]
        dlens_v = dlens[:, :]
        if "noprobe" in ablate:
            found = jnp.zeros((L, 1), jnp.bool_)
            slot = jnp.zeros((L, 1), I32)
            dlen = jnp.zeros((L, 1), I32)
            probe_mlen = jnp.zeros((L, D), I32)
        else:
            found, slot, dlen, probe_mlen = _probe(
                dictw_v, dlens_v, d_n, tw, D
            )

        if SCAN > 0 and "noscan" not in ablate:
            # all 32 rounds unconditionally: pure vector work with NO
            # vector->scalar syncs.  (The earlier per-round
            # pl.when(jnp.any(run)) gating cost a pipeline sync per round
            # — more than the skipped compute was worth.)
            iota_s = col_iota(SCANP)
            run = (iota_s < SCAN) & (win[:, 1 : 1 + SCANP] == win[:, 0:1])
            counts_l = [jnp.sum(run.astype(I32), axis=1, keepdims=True)]
            for i in range(1, MML):
                run = run & (
                    win[:, 1 + i : 1 + i + SCANP] == win[:, i : i + 1]
                )
                counts_l.append(jnp.sum(run.astype(I32), axis=1,
                                        keepdims=True))
            counts = jnp.concatenate(counts_l, axis=1)
        else:
            counts = jnp.zeros((L, MML), I32)

        # ================= E: spans, pair lookup, ctx0 DMA ============
        if DO_DMA:
            for l in range(L):
                r = lane_rowbase(l, R1) + xfer[l, XC_RCUR]
                pltpu.make_async_copy(
                    c1r.at[pl.ds(r, 1), :], c1cin.at[l], sem_row.at[l, 1]
                ).wait()

        hc = c1cin[:, 0, 0:1]
        idxc = -hc - 1
        negc = (rcur >= 0) & (hc < 0)
        if NR2_1:
            bcur = jnp.where(negc & (idxc < vc.m1), idxc, -1)
            gcur = jnp.where(negc & (idxc >= vc.m1), idxc - vc.m1, -1)
        else:
            bcur = jnp.where(negc, idxc, -1)
            gcur = None
        xfer[:, :] = set_col(xfer[:, :], XC_BCUR, bcur)
        if NR2_1:
            xfer[:, :] = set_col(xfer[:, :], XC_GCUR, gcur)
        if DO_DMA:
            # promoted rows are rare (most blocks never promote): one
            # scalar gate for the whole big-span fetch
            @pl.when(jnp.any(bcur >= 0))
            def _():
                for l in range(L):
                    @pl.when(xfer[l, XC_BCUR] >= 0)
                    def _(l=l):
                        r = lane_rowbase(l, R1) + S1 + xfer[l, XC_BCUR] * PB
                        pltpu.make_async_copy(
                            c1r.at[pl.ds(r, PB), :], c1cbig.at[l],
                            sem_row.at[l, 3],
                        ).start()
                for l in range(L):
                    @pl.when(xfer[l, XC_BCUR] >= 0)
                    def _(l=l):
                        r = lane_rowbase(l, R1) + S1 + xfer[l, XC_BCUR] * PB
                        pltpu.make_async_copy(
                            c1r.at[pl.ds(r, PB), :], c1cbig.at[l],
                            sem_row.at[l, 3],
                        ).wait()
        if DO_DMA and NR2_1:
            @pl.when(jnp.any(gcur >= 0))
            def _():
                for l in range(L):
                    @pl.when(xfer[l, XC_GCUR] >= 0)
                    def _(l=l):
                        r = (lane_rowbase(l, R1) + S1 + HB1
                             + xfer[l, XC_GCUR] * PB2_1)
                        pltpu.make_async_copy(
                            c1r.at[pl.ds(r, PB2_1), :], c1chug.at[l],
                            sem_row.at[l, 6],
                        ).start()
                for l in range(L):
                    @pl.when(xfer[l, XC_GCUR] >= 0)
                    def _(l=l):
                        r = (lane_rowbase(l, R1) + S1 + HB1
                             + xfer[l, XC_GCUR] * PB2_1)
                        pltpu.make_async_copy(
                            c1r.at[pl.ds(r, PB2_1), :], c1chug.at[l],
                            sem_row.at[l, 6],
                        ).wait()

        hub1n = get_col(R, R_HUB1_N)
        v_prev = rw.row_view(rw.FAM1, prev_c1, c1pin, c1pbig, hub1n, active,
                             hug_scr=c1phug_a, m=vc.m1)
        pair_found, _, pair_id = rw.row_find(
            rw.FAM1, v_prev, c1, c1pin, c1pbig, h1t[:, :], h1f[:, :],
            h1p[:, :], hug_scr=c1phug_a, nr2=NR2_1,
        )
        cid0 = jnp.where(pair_found & active, pair_id, 0)

        rc0 = jnp.where(active & (cid0 >= 1), cid0 - 1, -1)
        # unconditional fetch (clamped row; stray reads masked downstream)
        xfer[:, :] = set_col(xfer[:, :], XC_RC0, jnp.maximum(rc0, 0))
        if DO_DMA:
            for l in range(L):
                r = lane_rowbase(l, R0) + xfer[l, XC_RC0]
                pltpu.make_async_copy(
                    c0r.at[pl.ds(r, 1), :], c0in.at[l], sem_row.at[l, 4]
                ).start()

        # ================= F: sweep + vetoes (backend.c:76-97) ========
        T = params.max_match_count
        f1, f2 = params.magic_factor1, params.magic_factor2
        if "nosweep" in ablate:
            fbm = jnp.ones((L, 1), I32)
        elif T < 1:
            fbm = jnp.ones((L, 1), I32)
        elif f1 == 0 and f2 == 0:
            cand0 = counts >= 2
            level = jnp.minimum(counts - 1, T)
            key = jnp.where(cand0, level * MML + iota32c, -1)
            has = jnp.any(cand0, axis=1, keepdims=True)
            kmax = jnp.max(key, axis=1, keepdims=True)
            best_i = jnp.max(
                jnp.where(key == kmax, iota32c, -1), axis=1, keepdims=True
            )
            fbm = jnp.where(has, best_i + 1, 1)
        else:
            cand0 = counts >= 2
            level = jnp.minimum(counts - 1, T)
            # inactive lanes start resolved (fbm 1), as in ops/match.py
            res_scr[:, :] = jnp.where(
                (iota128 == 0) & ~active, 1, jnp.zeros((L, 128), I32)
            )
            rem_scr[:, :] = jnp.concatenate(
                [cand0.astype(I32), jnp.zeros((L, 128 - MML), I32)], 1
            )

            # scalar-carried while_loop: exits as soon as every lane is
            # resolved (typically 1-3 rounds), paying ONE vector->scalar
            # sync per executed round instead of a pl.when pred for all 32
            def sweep_cond(c):
                it, unresolved = c
                return (it < MML) & unresolved

            def sweep_round(c):
                it, _ = c
                result = res_scr[:, 0:1]
                remaining = rem_scr[:, 0:MML] != 0
                unresolved = result == 0
                key = jnp.where(remaining, level * MML + iota32c, -1)
                has = jnp.any(remaining, axis=1, keepdims=True)
                kmx = jnp.max(key, axis=1, keepdims=True)
                bi = jnp.maximum(
                    jnp.max(jnp.where(key == kmx, iota32c, -1),
                            axis=1, keepdims=True),
                    0,
                )
                result = jnp.where(unresolved & ~has, 1, result)
                pending = unresolved & has
                vetoed = jnp.zeros((L, 1), jnp.bool_)
                if f1 > 0:
                    vl = _probe_best_len(
                        dictw_v, dlens_v, d_n,
                        _pack_words(_select32(win, bi)), D,
                    )
                    vetoed = vetoed | (
                        pending & (bi >= 2) & (vl > 0)
                        & (vl * f1 > bi + 1)
                    )
                if f2 > 0:
                    veto2 = jnp.zeros((L, 1), jnp.bool_)
                    for o in range(1, MML):
                        vl_o = _probe_best_len(
                            dictw_v, dlens_v, d_n,
                            _pack_words(win[:, o : o + MML]), D,
                        )
                        veto2 = veto2 | (
                            (o <= bi) & (vl_o > 0)
                            & ((vl_o - o) * f2 > bi + 1)
                        )
                    vetoed = vetoed | (pending & (bi >= 1) & veto2)
                result = jnp.where(pending & ~vetoed, bi + 1, result)
                res_scr[:, :] = jnp.where(iota128 == 0, result,
                                          res_scr[:, :])
                clear = vetoed & (iota128 == bi)
                rem_scr[:, :] = jnp.where(clear, 0, rem_scr[:, :])
                still = jnp.sum((result == 0).astype(I32)) > 0
                return it + 1, still

            unresolved0 = jnp.sum(active.astype(I32)) > 0
            jax.lax.while_loop(
                sweep_cond, sweep_round, (jnp.int32(0), unresolved0)
            )
            fbm = res_scr[:, 0:1]

        # ================= wait ctx0, span DMA ========================
        if DO_DMA:
            for l in range(L):
                r = lane_rowbase(l, R0) + xfer[l, XC_RC0]
                pltpu.make_async_copy(
                    c0r.at[pl.ds(r, 1), :], c0in.at[l], sem_row.at[l, 4]
                ).wait()
        h0 = c0in[:, 0, 0:1]
        idx0 = -h0 - 1
        neg0c = (rc0 >= 0) & (h0 < 0)
        if NR2_0:
            bc0 = jnp.where(neg0c & (idx0 < vc.m0), idx0, -1)
            gc0 = jnp.where(neg0c & (idx0 >= vc.m0), idx0 - vc.m0, -1)
        else:
            bc0 = jnp.where(neg0c, idx0, -1)
            gc0 = None
        xfer[:, :] = set_col(xfer[:, :], XC_BC0, bc0)
        if NR2_0:
            xfer[:, :] = set_col(xfer[:, :], XC_GC0, gc0)
        if DO_DMA:
            @pl.when(jnp.any(bc0 >= 0))
            def _():
                for l in range(L):
                    @pl.when(xfer[l, XC_BC0] >= 0)
                    def _(l=l):
                        r = lane_rowbase(l, R0) + S0 + xfer[l, XC_BC0] * PB
                        pltpu.make_async_copy(
                            c0r.at[pl.ds(r, PB), :], c0big.at[l],
                            sem_row.at[l, 5],
                        ).start()
                for l in range(L):
                    @pl.when(xfer[l, XC_BC0] >= 0)
                    def _(l=l):
                        r = lane_rowbase(l, R0) + S0 + xfer[l, XC_BC0] * PB
                        pltpu.make_async_copy(
                            c0r.at[pl.ds(r, PB), :], c0big.at[l],
                            sem_row.at[l, 5],
                        ).wait()
        if DO_DMA and NR2_0:
            @pl.when(jnp.any(gc0 >= 0))
            def _():
                for l in range(L):
                    @pl.when(xfer[l, XC_GC0] >= 0)
                    def _(l=l):
                        r = (lane_rowbase(l, R0) + S0 + HB0
                             + xfer[l, XC_GC0] * PB2_0)
                        pltpu.make_async_copy(
                            c0r.at[pl.ds(r, PB2_0), :], c0hug.at[l],
                            sem_row.at[l, 7],
                        ).start()
                for l in range(L):
                    @pl.when(xfer[l, XC_GC0] >= 0)
                    def _(l=l):
                        r = (lane_rowbase(l, R0) + S0 + HB0
                             + xfer[l, XC_GC0] * PB2_0)
                        pltpu.make_async_copy(
                            c0r.at[pl.ds(r, PB2_0), :], c0hug.at[l],
                            sem_row.at[l, 7],
                        ).wait()

        # ================= G: mode stats + selection (x3.c:150-172) ===
        hub0n = get_col(R, R_HUB0_N)
        v0 = rw.row_view(rw.FAM0, cid0, c0in, c0big, hub0n, active,
                         hug_scr=c0hug_a, m=vc.m0)
        f0, pos0, _ = rw.row_find(
            rw.FAM0, v0, slot, c0in, c0big, h0t[:, :], h0f[:, :], None,
            hug_scr=c0hug_a, nr2=NR2_0,
        )
        low0, span0, tot0 = rw.row_stats(
            rw.FAM0, v0, pos0, c0in, c0big, h0f[:, :],
            hug_scr=c0hug_a, nr2=NR2_0,
        )
        v_cur = rw.row_view(rw.FAM1, c1, c1cin, c1cbig, hub1n, active,
                            hug_scr=c1chug_a, m=vc.m1)
        f1c, pos1, _ = rw.row_find(
            rw.FAM1, v_cur, slot, c1cin, c1cbig, h1t[:, :], h1f[:, :],
            h1p[:, :], hug_scr=c1chug_a, nr2=NR2_1,
        )
        low1, span1, tot1 = rw.row_stats(
            rw.FAM1, v_cur, pos1, c1cin, c1cbig, h1f[:, :],
            hug_scr=c1chug_a, nr2=NR2_1,
        )

        rank = jnp.sum(jnp.where(iotaD == slot, drank[:, :], 0), axis=1,
                       keepdims=True)
        ixv = ixf[:, :]
        ixlow = jnp.sum(jnp.where(iotaD < rank, ixv, 0), axis=1,
                        keepdims=True)
        ixspan = jnp.sum(jnp.where(iotaD == rank, ixv, 0), axis=1,
                         keepdims=True)
        ixtot = jnp.sum(ixv, axis=1, keepdims=True)

        evv = ev[:, :]
        etot = jnp.sum(evv, axis=1, keepdims=True)
        p_ev0 = _fprob(get_col(evv, E_CTX0), etot)
        p_ev1 = _fprob(get_col(evv, E_CTX1), etot)
        p_ev2 = _fprob(get_col(evv, E_IDX1), etot)
        zero = jnp.float32(0)
        prob0 = jnp.where(f0, p_ev0 * _fprob(span0, tot0), zero)
        prob1 = jnp.where(f1c, p_ev1 * _fprob(span1, tot1), zero)
        probx = p_ev2 * _fprob(ixspan, ixtot)
        mode = jnp.full((L, 1), E_IDX1, I32)
        best = probx
        take0 = prob0 > best
        mode = jnp.where(take0, E_CTX0, mode)
        best = jnp.where(take0, prob0, best)
        take1 = prob1 > best
        mode = jnp.where(take1, E_CTX1, mode)
        best = jnp.where(take1, prob1, best)

        # ================= decision (x3.c:381-404) ====================
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
        hit = active & found & (nl >= fbm) & (p + dlen <= tlen)
        miss = active & ~hit
        mlen = jnp.clip(jnp.minimum(fbm, tlen - p), 1, MML)
        dup = jnp.any(
            (iotaD < d_n) & (dlens_v == mlen) & (probe_mlen >= mlen),
            axis=1, keepdims=True,
        )

        # ================= H: AC coding ===============================
        acst = dict(
            low=get_col(R, R_AC_LOW).astype(U32),
            high=get_col(R, R_AC_HIGH).astype(U32),
            scale=get_col(R, R_AC_SCALE),
            nbits=get_col(R, R_NBITS),
            win_base=get_col(R, R_WIN_BASE),
            win=sinkw[:, :],
            oflow=jnp.zeros((L, 1), jnp.bool_),
        )
        esym = jnp.where(hit, mode, E_NEW)
        elow, espan, _et = _model_stats(evv, esym, 128)
        acst = ac_step(acst, elow, espan, etot, active)
        ev[:, :] = evv + jnp.where((iota128 == esym) & active, 1, 0)

        # payload symbol (x3.c:179-190 / 257-261)
        msv = ms[:, :]
        mslow, msspan, mstot = _model_stats(msv, mlen - 1, 128)
        is0 = hit & (mode == E_CTX0)
        is1 = hit & (mode == E_CTX1)
        isx = hit & (mode == E_IDX1)
        plow = jnp.where(is0, low0, jnp.where(is1, low1,
                jnp.where(isx, ixlow, mslow)))
        pspan = jnp.where(is0, span0, jnp.where(is1, span1,
                 jnp.where(isx, ixspan, msspan)))
        ptot = jnp.where(is0, tot0, jnp.where(is1, tot1,
                jnp.where(isx, ixtot, mstot)))
        acst = ac_step(acst, plow, pspan, ptot, active)
        ixf[:, :] = ixv + jnp.where((iotaD == rank) & isx, 1, 0)
        ms[:, :] = msv + jnp.where((iota128 == mlen - 1) & miss, 1, 0)

        # literal bytes (x3.c:263-267): scalar-carried loop, AC state
        # bridged through scratch
        frag32 = win[:, :MML]
        acw[:, :] = set_col(
            set_col(
                set_col(
                    set_col(
                        set_col(jnp.zeros((L, 128), I32), AC_LOW,
                                acst["low"].astype(I32)),
                        AC_HIGH, acst["high"].astype(I32)),
                    AC_SCALE, acst["scale"]),
                AC_NBITS, acst["nbits"]),
            AC_OFLOW, acst["oflow"].astype(I32),
        )
        sinkw[:, :] = acst["win"]
        acwf[:, :] = jnp.zeros((L, 128), F32)
        kmax = (jnp.int32(0) if "nolit" in ablate
                else jnp.max(jnp.where(miss, mlen, 0)))

        # early-exit scalar while: most events are dictionary hits with
        # zero literal bytes, and even a skipped gated round costs ~145 ns
        # (probe9) — 32 of them per event added up
        def lit_step(k):
            if True:
                a2 = acw[:, :]
                st2 = dict(
                    low=get_col(a2, AC_LOW).astype(U32),
                    high=get_col(a2, AC_HIGH).astype(U32),
                    scale=get_col(a2, AC_SCALE),
                    nbits=get_col(a2, AC_NBITS),
                    win_base=acst["win_base"],
                    win=sinkw[:, :],
                    oflow=get_col(a2, AC_OFLOW) != 0,
                )
                act = miss & (k < mlen)
                byte = jnp.sum(
                    jnp.where(iota32c == k, frag32, 0), axis=1,
                    keepdims=True,
                )
                chv = ch[:, :]
                i256 = col_iota(256)
                blow = jnp.sum(jnp.where(i256 < byte, chv, 0), axis=1,
                               keepdims=True)
                bspan = jnp.sum(jnp.where(i256 == byte, chv, 0), axis=1,
                                keepdims=True)
                btot = jnp.sum(chv, axis=1, keepdims=True)
                st2 = ac_step(st2, blow, bspan, btot, act)
                ch[:, :] = chv + jnp.where((i256 == byte) & act, 1, 0)
                acwf[:, :] = acwf[:, :] + jnp.where(
                    (col_iota(128) == 0) & act,
                    prims.bits_f32(bspan, btot), 0.0,
                )
                acw[:, :] = set_col(
                    set_col(
                        set_col(
                            set_col(
                                set_col(acw[:, :], AC_LOW,
                                        st2["low"].astype(I32)),
                                AC_HIGH, st2["high"].astype(I32)),
                            AC_SCALE, st2["scale"]),
                        AC_NBITS, st2["nbits"]),
                    AC_OFLOW, st2["oflow"].astype(I32),
                )
                sinkw[:, :] = st2["win"]

            return k + 1

        jax.lax.while_loop(lambda k: k < kmax, lit_step, jnp.int32(0))
        a2 = acw[:, :]
        acst = dict(
            low=get_col(a2, AC_LOW).astype(U32),
            high=get_col(a2, AC_HIGH).astype(U32),
            scale=get_col(a2, AC_SCALE),
            nbits=get_col(a2, AC_NBITS),
            win_base=acst["win_base"],
            win=sinkw[:, :],
            oflow=get_col(a2, AC_OFLOW) != 0,
        )
        lit_bits = acwf[:, 0:1]

        # stats (x3.c:192-193, 253-264)
        ev_bits = prims.bits_f32(espan, etot)
        ms_bits = prims.bits_f32(msspan, mstot)
        hit_bits = -jnp.log2(jnp.maximum(best, jnp.float32(1e-38)))
        add_bits = jnp.where(
            hit, hit_bits,
            jnp.where(miss, ev_bits + ms_bits + lit_bits, 0.0),
        )
        regsf[:, :] = regsf[:, :] + jnp.where(
            iota128 == esym, add_bits, 0.0
        )

        # ================= I: dictionary (dict.c:132, x3.c:411-420) ===
        drank_v = drank[:, :]
        dtago_v = dtago[:, :]
        validD = iotaD < d_n
        # MTF of the hit tag
        bump = validD & hit & (drank_v < rank)
        drank_v = jnp.where(bump, drank_v + 1, drank_v)
        drank_v = jnp.where((iotaD == slot) & hit, 0, drank_v)
        shifted = pltpu.roll(dtago_v, 1, axis=1)
        dtago_v = jnp.where(hit & (iotaD <= rank), shifted, dtago_v)
        dtago_v = jnp.where(hit & (iotaD == 0), slot, dtago_v)
        # insert on miss unless duplicate
        room = d_n < D
        ins = miss & ~dup & room
        of_dict = miss & ~dup & ~room
        slot_new = jnp.minimum(d_n, D - 1)
        pw = pl.when(jnp.any(ins))

        @pw
        def _():
            for w in range(8):
                cols = slice(w * D, (w + 1) * D)
                dictw[:, cols] = jnp.where(
                    ins & (iotaD == slot_new), tw[w], dictw[:, cols]
                )

        dlens[:, :] = jnp.where(ins & (iotaD == slot_new), mlen, dlens_v)
        drank_v = jnp.where(ins & validD, drank_v + 1, drank_v)
        drank_v = jnp.where(ins & (iotaD == slot_new), 0, drank_v)
        shifted2 = pltpu.roll(dtago_v, 1, axis=1)
        dtago_v = jnp.where(ins & (iotaD > 0), shifted2, dtago_v)
        dtago_v = jnp.where(ins & (iotaD == 0), slot_new, dtago_v)
        drank[:, :] = drank_v
        dtago[:, :] = dtago_v
        ixf[:, :] = jnp.where(ins & (iotaD == slot_new), 1, ixf[:, :])
        d_n2 = d_n + jnp.where(ins, 1, 0)

        # ================= J: context updates (x3.c:195-222) ==========
        pair_n = get_col(R, R_PAIR_N)
        promo0 = get_col(R, R_PROMO0_N)
        promo1 = get_col(R, R_PROMO1_N)
        huge0 = get_col(R, R_HUGE0_N)
        huge1 = get_col(R, R_HUGE1_N)
        hub0n2, promo0_2, dp0, span0_idx, of0, huge0_2, dg0, gid0 = (
            rw.row_update(
                rw.FAM0, v0, slot, f0, pos0, hit, c0in, c0big,
                h0t, h0f, None, hub0n, vc.hub0, promo0, vc.m0,
                hug_scr=c0hug_a, nr2=NR2_0, m=vc.m0, huge_n=huge0,
                huge_cap=vc.h2_0, big_trig=vc.big_trig0,
            )
        )
        hub1n2, promo1_2, dp1, span1_idx, of1, huge1_2, dg1, gid1 = (
            rw.row_update(
                rw.FAM1, v_cur, slot, f1c, pos1, hit, c1cin, c1cbig,
                h1t, h1f, h1p, hub1n, vc.hub1, promo1, vc.m1,
                # clamp the registered id: past the pairs capacity the
                # lane is OF_PAIRS-flagged (host discards + retries), but
                # an unclamped stored id would later address ctx0 rows
                # beyond the lane's region (cid0-1 feeds the row DMAs)
                new_pair_id=jnp.minimum(pair_n, S0 - 1),
                hug_scr=c1chug_a, nr2=NR2_1, m=vc.m1, huge_n=huge1,
                huge_cap=vc.h2_1, big_trig=vc.big_trig1,
            )
        )
        new_pair = hit & ~f1c
        of_pairs = new_pair & (pair_n >= S0)
        pair_n2 = pair_n + jnp.where(new_pair, 1, 0)

        # ================= K: write-backs, flush, advance =============
        wb0 = hit & (cid0 >= 1)
        wb0b = wb0 & (v0.is_big | dp0)
        wb1 = hit & (c1 >= 1)
        wb1b = wb1 & (v_cur.is_big | dp1)
        wb0g = wb0 & (v0.is_huge | dg0) if NR2_0 else None
        wb1g = wb1 & (v_cur.is_huge | dg1) if NR2_1 else None
        # unconditional write-backs: a non-hit lane's row scratch is
        # unmodified (row_update masks by hit), so writing it back is a
        # no-op byte-wise; lanes that fetched nothing target the per-lane
        # dump row (vc.dump0/dump1)
        wb0r = jnp.where(rc0 >= 0, rc0, vc.dump0)
        wb1r = jnp.where(rcur >= 0, rcur, vc.dump1)
        xf = xfer[:, :]
        xf = set_col(xf, XC_WB0R, wb0r)
        xf = set_col(xf, XC_WB0B, wb0b.astype(I32))
        xf = set_col(xf, XC_WB0S, span0_idx)
        xf = set_col(xf, XC_WB1R, wb1r)
        xf = set_col(xf, XC_WB1B, wb1b.astype(I32))
        xf = set_col(xf, XC_WB1S, span1_idx)
        if NR2_0:
            xf = set_col(xf, XC_WB0G, wb0g.astype(I32))
            xf = set_col(xf, XC_WB0GS, gid0)
        if NR2_1:
            xf = set_col(xf, XC_WB1G, wb1g.astype(I32))
            xf = set_col(xf, XC_WB1GS, gid1)
        xfer[:, :] = xf
        any_wbb = jnp.any(wb0b | wb1b)
        if NR2_0 or NR2_1:
            wbg_acc = jnp.zeros((L, 1), jnp.bool_)
            if NR2_0:
                wbg_acc = wbg_acc | wb0g
            if NR2_1:
                wbg_acc = wbg_acc | wb1g
            any_wbg = jnp.any(wbg_acc)
        if DO_DMA:
            for l in range(L):
                r = lane_rowbase(l, R0) + xfer[l, XC_WB0R]
                pltpu.make_async_copy(
                    c0in.at[l], c0r.at[pl.ds(r, 1), :], sem_wb.at[l, 0]
                ).start()
                r1w = lane_rowbase(l, R1) + xfer[l, XC_WB1R]
                pltpu.make_async_copy(
                    c1cin.at[l], c1r.at[pl.ds(r1w, 1), :], sem_wb.at[l, 2]
                ).start()

            @pl.when(any_wbb)
            def _():
                for l in range(L):
                    @pl.when(xfer[l, XC_WB0B] != 0)
                    def _(l=l):
                        r = lane_rowbase(l, R0) + S0 + xfer[l, XC_WB0S] * PB
                        pltpu.make_async_copy(
                            c0big.at[l], c0r.at[pl.ds(r, PB), :],
                            sem_wb.at[l, 1],
                        ).start()

                    @pl.when(xfer[l, XC_WB1B] != 0)
                    def _(l=l):
                        r = lane_rowbase(l, R1) + S1 + xfer[l, XC_WB1S] * PB
                        pltpu.make_async_copy(
                            c1cbig.at[l], c1r.at[pl.ds(r, PB), :],
                            sem_wb.at[l, 3],
                        ).start()

            if NR2_0 or NR2_1:
                @pl.when(any_wbg)
                def _():
                    for l in range(L):
                        if NR2_0:
                            @pl.when(xfer[l, XC_WB0G] != 0)
                            def _(l=l):
                                r = (lane_rowbase(l, R0) + S0 + HB0
                                     + xfer[l, XC_WB0GS] * PB2_0)
                                pltpu.make_async_copy(
                                    c0hug.at[l], c0r.at[pl.ds(r, PB2_0), :],
                                    sem_wb.at[l, 4],
                                ).start()
                        if NR2_1:
                            @pl.when(xfer[l, XC_WB1G] != 0)
                            def _(l=l):
                                r = (lane_rowbase(l, R1) + S1 + HB1
                                     + xfer[l, XC_WB1GS] * PB2_1)
                                pltpu.make_async_copy(
                                    c1chug.at[l], c1r.at[pl.ds(r, PB2_1), :],
                                    sem_wb.at[l, 5],
                                ).start()

        # sink flush: move a full FLUSH_WORDS half out to HBM.  Bounded to
        # the lane's orows region (the decoder's flush has the analogous
        # gate): past the output capacity the lane is already OF_OUT-
        # flagged — its stream is discarded by the host retry — and an
        # unbounded flush row would DMA into the NEXT lane's output
        win_base = acst["win_base"]
        widx_now = (acst["nbits"] >> 5) - win_base
        flush = (widx_now >= FLUSH_WORDS) & (
            (win_base >> 7) + 2 <= orows
        )
        xfer[:, :] = set_col(
            set_col(xfer[:, :], XC_FLUSH, flush.astype(I32)),
            XC_FROW, win_base >> 7,
        )

        @pl.when(jnp.any(flush))
        def _():
            stage[:, 0, :] = sinkw[:, 0:128]
            stage[:, 1, :] = sinkw[:, 128:256]
            for l in range(L):
                @pl.when(xfer[l, XC_FLUSH] != 0)
                def _(l=l):
                    r = lane_rowbase(l, orows) + xfer[l, XC_FROW]
                    pltpu.make_async_copy(
                        stage.at[l], outw.at[pl.ds(r, 2), :], sem_out.at[l]
                    ).start()
            for l in range(L):
                @pl.when(xfer[l, XC_FLUSH] != 0)
                def _(l=l):
                    r = lane_rowbase(l, orows) + xfer[l, XC_FROW]
                    pltpu.make_async_copy(
                        stage.at[l], outw.at[pl.ds(r, 2), :], sem_out.at[l]
                    ).wait()

        shifted_win = jnp.concatenate(
            [acst["win"][:, FLUSH_WORDS:], jnp.zeros((L, FLUSH_WORDS), I32)],
            axis=1,
        )
        sinkw[:, :] = jnp.where(flush, shifted_win, acst["win"])
        win_base2 = win_base + jnp.where(flush, FLUSH_WORDS, 0)

        # wait row write-backs before the next event's reads
        if DO_DMA:
            for l in range(L):
                r = lane_rowbase(l, R0) + xfer[l, XC_WB0R]
                pltpu.make_async_copy(
                    c0in.at[l], c0r.at[pl.ds(r, 1), :], sem_wb.at[l, 0]
                ).wait()
                r1w = lane_rowbase(l, R1) + xfer[l, XC_WB1R]
                pltpu.make_async_copy(
                    c1cin.at[l], c1r.at[pl.ds(r1w, 1), :], sem_wb.at[l, 2]
                ).wait()

            @pl.when(any_wbb)
            def _():
                for l in range(L):
                    @pl.when(xfer[l, XC_WB0B] != 0)
                    def _(l=l):
                        r = lane_rowbase(l, R0) + S0 + xfer[l, XC_WB0S] * PB
                        pltpu.make_async_copy(
                            c0big.at[l], c0r.at[pl.ds(r, PB), :],
                            sem_wb.at[l, 1],
                        ).wait()

                    @pl.when(xfer[l, XC_WB1B] != 0)
                    def _(l=l):
                        r = lane_rowbase(l, R1) + S1 + xfer[l, XC_WB1S] * PB
                        pltpu.make_async_copy(
                            c1cbig.at[l], c1r.at[pl.ds(r, PB), :],
                            sem_wb.at[l, 3],
                        ).wait()

            if NR2_0 or NR2_1:
                @pl.when(any_wbg)
                def _():
                    for l in range(L):
                        if NR2_0:
                            @pl.when(xfer[l, XC_WB0G] != 0)
                            def _(l=l):
                                r = (lane_rowbase(l, R0) + S0 + HB0
                                     + xfer[l, XC_WB0GS] * PB2_0)
                                pltpu.make_async_copy(
                                    c0hug.at[l], c0r.at[pl.ds(r, PB2_0), :],
                                    sem_wb.at[l, 4],
                                ).wait()
                        if NR2_1:
                            @pl.when(xfer[l, XC_WB1G] != 0)
                            def _(l=l):
                                r = (lane_rowbase(l, R1) + S1 + HB1
                                     + xfer[l, XC_WB1GS] * PB2_1)
                                pltpu.make_async_copy(
                                    c1chug.at[l], c1r.at[pl.ds(r, PB2_1), :],
                                    sem_wb.at[l, 5],
                                ).wait()

        # prev-row cache swap (x3.c:406 prev_context1 = context1): lanes
        # that hit carry the UPDATED cur row as next event's prev row; a
        # miss resets prev to the hub, so c1pin content is then unread
        c1pin[:, 0, :] = jnp.where(
            hit & (c1 >= 1), c1cin[:, 0, :], c1pin[:, 0, :]
        )

        @pl.when(jnp.any(wb1b))
        def _():
            for r in range(PB):
                c1pbig[:, r, :] = jnp.where(
                    wb1b, c1cbig[:, r, :], c1pbig[:, r, :]
                )

        if NR2_1:
            # a hit on a huge (or just-promoted) cur row carries its huge
            # span into the prev cache, like the big swap above
            @pl.when(jnp.any(wb1g))
            def _():
                for r in range(PB2_1):
                    c1phug[:, r, :] = jnp.where(
                        wb1g, c1chug[:, r, :], c1phug[:, r, :]
                    )

        # advance (x3.c:397-428 mirror of codec.py step 9)
        p2 = p + jnp.where(hit, dlen, jnp.where(miss, mlen, 0))
        prev2 = jnp.where(hit, c1, jnp.where(miss, 0, prev_c1))
        c1_2 = jnp.where(hit, slot, jnp.where(miss, 0, c1))

        of_out = acst["oflow"] | (
            acst["nbits"] > vc.out_words * 32 - 32 * FLUSH_WORDS
        )
        of_bits = (
            jnp.where(of_dict, OF_DICT, 0)
            | jnp.where(of0, OF_CTX0, 0)
            | jnp.where(of1, OF_CTX1, 0)
            | jnp.where(of_pairs, OF_PAIRS, 0)
            | jnp.where(of_out, OF_OUT, 0)
        )

        Rn = R
        Rn = set_col(Rn, R_P, p2)
        Rn = set_col(Rn, R_PREV_C1, prev2)
        Rn = set_col(Rn, R_C1, c1_2)
        Rn = set_col(Rn, R_PAIR_N, pair_n2)
        Rn = set_col(Rn, R_DICT_N, d_n2)
        Rn = set_col(Rn, R_AC_LOW, acst["low"].astype(I32))
        Rn = set_col(Rn, R_AC_HIGH, acst["high"].astype(I32))
        Rn = set_col(Rn, R_AC_SCALE, acst["scale"])
        Rn = set_col(Rn, R_NBITS, acst["nbits"])
        Rn = set_col(Rn, R_WIN_BASE, win_base2)
        Rn = set_col(Rn, R_SEG_BASE, row0)
        Rn = set_col(Rn, R_HUB0_N, hub0n2)
        Rn = set_col(Rn, R_HUB1_N, hub1n2)
        Rn = set_col(Rn, R_PROMO0_N, promo0_2)
        Rn = set_col(Rn, R_PROMO1_N, promo1_2)
        if NR2_0:
            Rn = set_col(Rn, R_HUGE0_N, huge0_2)
        if NR2_1:
            Rn = set_col(Rn, R_HUGE1_N, huge1_2)
        Rn = set_col(Rn, R_OFLOW, get_col(R, R_OFLOW) | of_bits)
        # event counters (x3.c:42): counts[esym] += 1
        Rn = Rn + jnp.where(
            (iota128 == R_COUNTS + esym) & active, 1, 0
        )
        regsi[:, :] = Rn

        alive = jnp.sum((p2 < tlen).astype(I32)) > 0
        return step + 1, alive

    def cond(carry):
        step, alive = carry
        return (step < nsteps) & alive

    jax.lax.while_loop(cond, event_body, (jnp.int32(0), jnp.bool_(True)))


def build_encoder_call(vc: VMCaps, params: X3Params, nsteps: int, G: int,
                       ablate: frozenset = frozenset()):
    """Construct the jitted pallas_call for (vc, params, nsteps, G)."""
    D = vc.dict_cap
    SR = _seg_rows(vc)
    G8 = G * L
    trows = vc.text_bytes // 128
    orows = vc.out_words // 128
    SCAN = params.window - MML - 1
    SCANP = max((SCAN + 127) // 128 * 128, 128)

    kern = functools.partial(
        encoder_kernel, vc=vc, params=params, nsteps=nsteps,
        trows=trows, orows=orows, ablate=ablate,
    )

    def vspec(width):
        return pl.BlockSpec((L, width), lambda g: (g, 0),
                            memory_space=pltpu.VMEM)

    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    carried_widths = [
        8 * D, D, D, D, D, vc.hub0, vc.hub0, vc.hub1, vc.hub1, vc.hub1,
        128, 128, 256, 128, 128, 2 * FLUSH_WORDS,
    ]
    in_specs = (
        [anyspec]
        + [vspec(w) for w in carried_widths]
        + [anyspec, anyspec, anyspec]
    )
    out_specs = [vspec(w) for w in carried_widths] + [anyspec] * 3

    def shapes(dtype_f32_idx):
        out = []
        for i, w in enumerate(carried_widths):
            dt = jnp.float32 if i == dtype_f32_idx else jnp.int32
            out.append(jax.ShapeDtypeStruct((G8, w), dt))
        out.append(jax.ShapeDtypeStruct((G8 * orows, 128), jnp.int32))
        out.append(jax.ShapeDtypeStruct((G8 * vc.r0, 128), jnp.int32))
        out.append(jax.ShapeDtypeStruct((G8 * vc.r1, 128), jnp.int32))
        return out

    out_shape = shapes(dtype_f32_idx=14)  # regs_f is f32

    scratch = [
        pltpu.VMEM((L, SR, 128), I32),          # tseg
        pltpu.VMEM((L, SR * 128), I32),         # seg32
        pltpu.VMEM((L, 1, 128), I32),           # c0in
        pltpu.VMEM((L, PB, 128), I32),          # c0big
        pltpu.VMEM((L, 1, 128), I32),           # c1pin
        pltpu.VMEM((L, PB, 128), I32),          # c1pbig
        pltpu.VMEM((L, 1, 128), I32),           # c1cin
        pltpu.VMEM((L, PB, 128), I32),          # c1cbig
        pltpu.VMEM((L, vc.pb2_0, 128), I32),    # c0hug (1-row dummy if off)
        pltpu.VMEM((L, vc.pb2_1, 128), I32),    # c1phug
        pltpu.VMEM((L, vc.pb2_1, 128), I32),    # c1chug
        pltpu.VMEM((L, 2, 128), I32),           # stage
        pltpu.VMEM((L, 128), I32),              # rem_scr
        pltpu.VMEM((L, 128), I32),              # res_scr
        pltpu.VMEM((L, 128), I32),              # xfer
        pltpu.VMEM((L, 128), I32),              # acw
        pltpu.VMEM((L, 128), jnp.float32),      # acwf
        pltpu.SemaphoreType.DMA((L,)),          # sem_seg
        pltpu.SemaphoreType.DMA((L, 9)),        # sem_row
        pltpu.SemaphoreType.DMA((L, 6)),        # sem_wb
        pltpu.SemaphoreType.DMA((L,)),          # sem_out
    ]

    cp = vmem_compiler_params(sum(L * w * 4 for w in carried_widths),
                              scratch)

    def call(text32, *state, interpret=False):
        return pl.pallas_call(
            kern,
            grid=(G,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            input_output_aliases={i + 1: i for i in range(19)},
            scratch_shapes=scratch,
            compiler_params=cp,
            interpret=interpret,
        )(text32, *state)

    return call
