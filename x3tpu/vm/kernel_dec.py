"""The codec-VM decoder kernel: the whole x3 decode loop in one Pallas
program.

Mirror of kernel.py for the decode direction (x3.c:285-353 semantics, as
modeled by x3tpu/codec.py:_dec_body).  One launch decodes up to ``nsteps``
events per lane of a group; all adaptive state is identical to the
encoder's (dictionary planes, hub/inline/promoted context rows, dense
model rows) so the two kernels stay in lockstep by construction.  The
decode direction has NO window scan and NO mode-selection probability
sweep — the mode arrives explicitly in the stream (x3.c:150-172 is
encoder-only) — so a decode event is substantially cheaper than its
encode twin.

Per-event phases:
  A  source-window refill (read-ahead DMA of compressed words)
  B  start ctx1 row DMAs for (prev_c1, c1)        [x3.c:63-67]
  C  decode event symbol via model_events          [x3.c:293]
  D  E_NEW: length + literal bytes (serial loop)   [x3.c:272-283]
  E  hit: pair lookup, ctx0 row DMA, payload decode by mode
                                                   [x3.c:57-129]
  F  dictionary MTF / insert (+ dup lookup)        [x3.c:309-317, 337-348]
  G  context updates + pair registration           [x3.c:99-127]
  H  output emit + flush, row write-backs, advance
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
    FLUSH_WORDS, LANES, OBF, OBW, OF_CTX0, OF_CTX1, OF_DICT, OF_OUT,
    OF_PAIRS, PB, R_AC_BUF, R_AC_HIGH, R_AC_LOW, R_C1, R_COUNTS, R_DICT_N,
    R_DONE, R_HUB0_N, R_HUB1_N, R_HUGE0_N, R_HUGE1_N, R_NBITS, R_OFLOW,
    R_OPOS, R_OUT_BASE, R_PAIR_N, R_PREV_C1, R_PROMO0_N, R_PROMO1_N,
    R_SRC_BASE, R_SRC_NW, VMCaps,
)
from x3tpu.vm.kernel import _model_stats, _pack_words, _probe_matchlen
from x3tpu.vm.prims import col_iota, get_col, set_col, vmem_compiler_params

I32 = jnp.int32
U32 = jnp.uint32
F32 = jnp.float32
L = LANES
MML = MAX_MATCH_LEN
FW = FLUSH_WORDS
FWROWS = FLUSH_WORDS // 128
OBROWS_F = OBF // 128

# xfer scratch columns (vector -> scalar handoffs for DMA addressing)
XC_SREF, XC_SROW = 0, 1
XC_RPREV, XC_RCUR, XC_BPREV, XC_BCUR, XC_RC0, XC_BC0 = 2, 3, 4, 5, 6, 7
XC_WB1R, XC_WB1B, XC_WB1S, XC_WB0R, XC_WB0B, XC_WB0S = 8, 9, 10, 11, 12, 13
XC_FLUSH, XC_FROW = 14, 15
# huge-tier columns (only written when the tier is compiled in)
XC_GPREV, XC_GCUR, XC_GC0 = 16, 17, 18
XC_WB1G, XC_WB1GS, XC_WB0G, XC_WB0GS = 19, 20, 21, 22
# acw scratch columns (AC state bridge across the literal while-loop)
AC_LOW, AC_HIGH, AC_BUF, AC_BITPOS = 0, 1, 2, 3


def _st_of(R, srcwin):
    """AC decode state dict from the register row + source window value."""
    return dict(
        low=get_col(R, R_AC_LOW).astype(U32),
        high=get_col(R, R_AC_HIGH).astype(U32),
        buf=get_col(R, R_AC_BUF).astype(U32),
        bitpos=get_col(R, R_NBITS),
        src_base=get_col(R, R_SRC_BASE),
        nwords=get_col(R, R_SRC_NW),
        win=srcwin,
    )


def decoder_kernel(
    # inputs
    srcflat, dictw_i, dlens_i, drank_i, dtago_i, ixf_i,
    h0t_i, h0f_i, h1t_i, h1f_i, h1p_i, ev_i, ms_i, ch_i,
    regsi_i, regsf_i, srcwin_i, outwin_i,
    outb_i, c0r_i, c1r_i,
    # outputs (aliased with inputs 1..20)
    dictw, dlens, drank, dtago, ixf,
    h0t, h0f, h1t, h1f, h1p, ev, ms, ch,
    regsi, regsf, srcwin, outwin,
    outb, c0r, c1r,
    # scratch
    sseg, c0in, c0big, c1pin, c1pbig, c1cin, c1cbig,
    c0hug, c1phug, c1chug,
    stage, frag_scr, acw, acwf, xfer,
    sem_src, sem_row, sem_wb, sem_out,
    *, vc: VMCaps, params: X3Params, nsteps: int, srows: int, obrows: int,
):
    g = pl.program_id(0)
    D = vc.dict_cap
    S0, S1 = vc.s0, vc.s1
    R0, R1 = vc.r0, vc.r1
    OCAP = vc.block_bytes
    # huge tier statics (mirror of kernel.py)
    NR2_0, NR2_1 = vc.nr2_0, vc.nr2_1
    PB2_0, PB2_1 = vc.pb2_0, vc.pb2_1
    HB0, HB1 = vc.hug0_base, vc.hug1_base
    c0hug_a = c0hug if NR2_0 else None
    c1phug_a = c1phug if NR2_1 else None
    c1chug_a = c1chug if NR2_1 else None

    # carried VMEM state: copy input -> aliased output, use out refs after
    for a, b in (
        (dictw_i, dictw), (dlens_i, dlens), (drank_i, drank),
        (dtago_i, dtago), (ixf_i, ixf), (h0t_i, h0t), (h0f_i, h0f),
        (h1t_i, h1t), (h1f_i, h1f), (h1p_i, h1p), (ev_i, ev), (ms_i, ms),
        (ch_i, ch), (regsi_i, regsi), (regsf_i, regsf),
        (srcwin_i, srcwin), (outwin_i, outwin),
    ):
        b[:, :] = a[:, :]

    iota128 = col_iota(128)
    iotaD = col_iota(D)
    iota32c = col_iota(MML)

    def lane_rowbase(l, rper):
        return (g * L + l) * rper

    # ---- pre-loop: prime the prev-ctx1 row cache (mirror of kernel.py:
    # the loop never fetches the prev row; after a hit the updated cur row
    # is swapped in, after E_NEW prev resets to the hub)
    R0v = regsi[:, :]
    prev0 = get_col(R0v, R_PREV_C1)
    act0 = get_col(R0v, R_DONE) == 0
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
                    c1r.at[pl.ds(r, PB), :], c1pbig.at[l], sem_row.at[l, 2]
                ).start()
        for l in range(L):
            @pl.when(xfer[l, XC_BPREV] >= 0)
            def _(l=l):
                r = lane_rowbase(l, R1) + S1 + xfer[l, XC_BPREV] * PB
                pltpu.make_async_copy(
                    c1r.at[pl.ds(r, PB), :], c1pbig.at[l], sem_row.at[l, 2]
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
        done = get_col(R, R_DONE) != 0
        active = ~done

        # ================= A: source refill =================
        bitpos = get_col(R, R_NBITS)
        src_base = get_col(R, R_SRC_BASE)
        widx = (bitpos >> 5) - src_base
        refill = active & (widx >= FW)
        src_base2 = src_base + jnp.where(refill, FW, 0)
        srow = (src_base2 + FW) >> 7
        can_dma = refill & (srow + FWROWS <= srows)
        xfer[:, :] = set_col(
            set_col(xfer[:, :], XC_SREF, can_dma.astype(I32)),
            XC_SROW, srow,
        )
        @pl.when(jnp.any(can_dma))
        def _():
            for l in range(L):
                @pl.when(xfer[l, XC_SREF] != 0)
                def _(l=l):
                    r = lane_rowbase(l, srows) + xfer[l, XC_SROW]
                    pltpu.make_async_copy(
                        srcflat.at[pl.ds(r, FWROWS), :], sseg.at[l],
                        sem_src.at[l],
                    ).start()
            for l in range(L):
                @pl.when(xfer[l, XC_SREF] != 0)
                def _(l=l):
                    r = lane_rowbase(l, srows) + xfer[l, XC_SROW]
                    pltpu.make_async_copy(
                        srcflat.at[pl.ds(r, FWROWS), :], sseg.at[l],
                        sem_src.at[l],
                    ).wait()

        @pl.when(jnp.any(refill))
        def _():
            iota2 = col_iota(2 * FW)
            shifted = jnp.concatenate(
                [srcwin[:, FW:], jnp.zeros((L, FW), I32)], axis=1
            )
            merged = shifted
            for r in range(FWROWS):
                lo = FW + r * 128
                placed = jnp.concatenate(
                    [jnp.zeros((L, lo), I32), sseg[:, r, :],
                     jnp.zeros((L, 2 * FW - lo - 128), I32)]
                    if lo + 128 < 2 * FW else
                    [jnp.zeros((L, lo), I32), sseg[:, r, :]],
                    axis=1,
                )
                merged = jnp.where(
                    can_dma & (iota2 >= lo) & (iota2 < lo + 128),
                    placed, merged,
                )
            srcwin[:, :] = jnp.where(refill, merged, srcwin[:, :])

        # ================= B: start ctx1 row DMAs =================
        prev_c1 = get_col(R, R_PREV_C1)
        c1 = get_col(R, R_C1)
        rcur = jnp.where(active & (c1 >= 1), c1 - 1, -1)
        # unconditional fetch, row clamped to 0 (stray reads masked
        # downstream); the prev row comes from the swap cache, never HBM
        xfer[:, :] = set_col(xfer[:, :], XC_RCUR, jnp.maximum(rcur, 0))
        for l in range(L):
            r = lane_rowbase(l, R1) + xfer[l, XC_RCUR]
            pltpu.make_async_copy(
                c1r.at[pl.ds(r, 1), :], c1cin.at[l], sem_row.at[l, 1]
            ).start()

        # ================= C: event symbol (x3.c:293) =================
        # NB: src_base2, not the register value — the refill above already
        # shifted the window, so reads this event must use the new base
        st = dict(_st_of(R, srcwin[:, :]), src_base=src_base2)
        evv = ev[:, :]
        etot = jnp.sum(evv, axis=1, keepdims=True)
        estep, evalue = prims.ac_decode_value(st, etot)
        esym, elow, espan = prims.model_decode(evv, evalue, 128)
        esym = jnp.where(active, esym, E_EOF)
        st = prims.ac_decode_update(st, estep, elow, espan, active)
        ev[:, :] = evv + jnp.where((iota128 == esym) & active, 1, 0)

        eof = active & (esym == E_EOF)
        is_new = active & (esym == E_NEW)
        hit = active & ~eof & ~is_new

        # ================= D: E_NEW length + literals =================
        msv = ms[:, :]
        mstot = jnp.sum(msv, axis=1, keepdims=True)
        lstep, lvalue = prims.ac_decode_value(st, mstot)
        lsym, lslow, lsspan = prims.model_decode(msv, lvalue, 128)
        st = prims.ac_decode_update(st, lstep, lslow, lsspan, is_new)
        ms[:, :] = msv + jnp.where((iota128 == lsym) & is_new, 1, 0)
        length_new = jnp.where(is_new, lsym + 1, 0)

        # literal bytes: scalar-carried loop, AC state bridged via scratch
        acw[:, :] = set_col(
            set_col(
                set_col(
                    set_col(jnp.zeros((L, 128), I32), AC_LOW,
                            st["low"].astype(I32)),
                    AC_HIGH, st["high"].astype(I32)),
                AC_BUF, st["buf"].astype(I32)),
            AC_BITPOS, st["bitpos"],
        )
        acwf[:, :] = jnp.zeros((L, 128), F32)
        frag_scr[:, :] = jnp.zeros((L, 128), I32)
        kmax = jnp.max(jnp.where(is_new, length_new, 0))

        # early-exit scalar while (mirror of kernel.py)
        def lit_step(k):
            if True:
                a2 = acw[:, :]
                st2 = dict(
                    low=get_col(a2, AC_LOW).astype(U32),
                    high=get_col(a2, AC_HIGH).astype(U32),
                    buf=get_col(a2, AC_BUF).astype(U32),
                    bitpos=get_col(a2, AC_BITPOS),
                    src_base=st["src_base"],
                    nwords=st["nwords"],
                    win=srcwin[:, :],
                )
                act = is_new & (k < length_new)
                chv = ch[:, :]
                btot = jnp.sum(chv, axis=1, keepdims=True)
                bstep, bvalue = prims.ac_decode_value(st2, btot)
                bsym, blow, bspan = prims.model_decode(chv, bvalue, 256)
                st2 = prims.ac_decode_update(st2, bstep, blow, bspan, act)
                ch[:, :] = chv + jnp.where(
                    (col_iota(256) == bsym) & act, 1, 0
                )
                frag_scr[:, :] = jnp.where(
                    (col_iota(128) == k) & act, bsym, frag_scr[:, :]
                )
                acwf[:, :] = acwf[:, :] + jnp.where(
                    (col_iota(128) == 0) & act,
                    prims.bits_f32(bspan, btot), 0.0,
                )
                acw[:, :] = set_col(
                    set_col(
                        set_col(
                            set_col(acw[:, :], AC_LOW,
                                    st2["low"].astype(I32)),
                            AC_HIGH, st2["high"].astype(I32)),
                        AC_BUF, st2["buf"].astype(I32)),
                    AC_BITPOS, st2["bitpos"],
                )

            return k + 1

        jax.lax.while_loop(lambda k: k < kmax, lit_step, jnp.int32(0))
        a2 = acw[:, :]
        st = dict(
            st,
            low=get_col(a2, AC_LOW).astype(U32),
            high=get_col(a2, AC_HIGH).astype(U32),
            buf=get_col(a2, AC_BUF).astype(U32),
            bitpos=get_col(a2, AC_BITPOS),
            win=srcwin[:, :],
        )
        lit_bits = acwf[:, 0:1]
        frag32 = frag_scr[:, :MML]
        tw_frag = _pack_words(
            jnp.where(iota32c < length_new, frag32, 0)
        )

        # ================= E: hit payload (x3.c:57-129) ===============
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

        if NR2_1:
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
        for l in range(L):
            r = lane_rowbase(l, R0) + xfer[l, XC_RC0]
            pltpu.make_async_copy(
                c0r.at[pl.ds(r, 1), :], c0in.at[l], sem_row.at[l, 4]
            ).start()
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

        if NR2_0:
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

        hub0n = get_col(R, R_HUB0_N)
        v0 = rw.row_view(rw.FAM0, cid0, c0in, c0big, hub0n, active,
                         hug_scr=c0hug_a, m=vc.m0)
        v_cur = rw.row_view(rw.FAM1, c1, c1cin, c1cbig, hub1n, active,
                            hug_scr=c1chug_a, m=vc.m1)

        is0 = hit & (esym == E_CTX0)
        is1 = hit & (esym == E_CTX1)
        isx = hit & (esym == E_IDX1)

        _, _, tot0 = rw.row_stats(
            rw.FAM0, v0, jnp.zeros((L, 1), I32), c0in, c0big, h0f[:, :],
            hug_scr=c0hug_a, nr2=NR2_0,
        )
        _, _, tot1 = rw.row_stats(
            rw.FAM1, v_cur, jnp.zeros((L, 1), I32), c1cin, c1cbig,
            h1f[:, :], hug_scr=c1chug_a, nr2=NR2_1,
        )
        ixv = ixf[:, :]
        ixtot = jnp.sum(ixv, axis=1, keepdims=True)
        ptot = jnp.where(is0, tot0, jnp.where(is1, tot1, ixtot))
        ptot = jnp.maximum(ptot, 1)
        pstep, pvalue = prims.ac_decode_value(st, ptot)
        pos0d, tag0d, low0d, span0d = rw.row_decode_pos(
            rw.FAM0, v0, pvalue, c0in, c0big, h0f[:, :], h0t[:, :],
            hug_scr=c0hug_a, nr2=NR2_0,
        )
        pos1d, tag1d, low1d, span1d = rw.row_decode_pos(
            rw.FAM1, v_cur, pvalue, c1cin, c1cbig, h1f[:, :], h1t[:, :],
            hug_scr=c1chug_a, nr2=NR2_1,
        )
        rankd, ixlowd, ixspand = prims.model_decode(ixv, pvalue, D)
        dtago_v0 = dtago[:, :]
        slot_x = jnp.sum(jnp.where(iotaD == rankd, dtago_v0, 0), axis=1,
                         keepdims=True)

        slot_hit = jnp.where(is0, tag0d, jnp.where(is1, tag1d, slot_x))
        plow = jnp.where(is0, low0d, jnp.where(is1, low1d, ixlowd))
        pspan = jnp.where(is0, span0d, jnp.where(is1, span1d, ixspand))
        st = prims.ac_decode_update(st, pstep, plow, pspan, hit)
        ixf[:, :] = ixv + jnp.where((iotaD == rankd) & isx, 1, 0)

        # stats mirror (x3.c:294, 78-96, 275-281)
        ev_bits = prims.bits_f32(espan, etot)
        ms_bits = prims.bits_f32(lsspan, mstot)
        pay_bits = prims.bits_f32(pspan, ptot)
        add_bits = jnp.where(
            hit, ev_bits + pay_bits,
            jnp.where(is_new, ev_bits + ms_bits + lit_bits,
                      jnp.where(eof, ev_bits, 0.0)),
        )
        regsf[:, :] = regsf[:, :] + jnp.where(
            iota128 == esym, add_bits, 0.0
        )
        # E_EOF is never counted (matches the reference and the encoder)
        counts_add = jnp.where(
            (iota128 == R_COUNTS + esym) & active & (esym != E_EOF), 1, 0
        )

        # ================= F: dictionary (x3.c:309-317, 337-348) ======
        d_n = get_col(R, R_DICT_N)
        dictw_v = dictw[:, :]
        dlens_v = dlens[:, :]
        drank_v = drank[:, :]
        dtago_v = dtago_v0
        validD = iotaD < d_n

        # dup lookup of the decoded fragment (pre-insert state)
        frag_mlen = _probe_matchlen(dictw_v, tw_frag, D)
        dup = jnp.any(
            validD & (dlens_v == length_new) & (frag_mlen >= length_new)
            & is_new,
            axis=1, keepdims=True,
        )

        # MTF of the hit slot (rank = recency rank of slot_hit)
        rank_mtf = jnp.sum(jnp.where(iotaD == slot_hit, drank_v, 0), axis=1,
                           keepdims=True)
        bump = validD & hit & (drank_v < rank_mtf)
        drank_v = jnp.where(bump, drank_v + 1, drank_v)
        drank_v = jnp.where((iotaD == slot_hit) & hit, 0, drank_v)
        shifted = pltpu.roll(dtago_v, 1, axis=1)
        dtago_v = jnp.where(hit & (iotaD <= rank_mtf), shifted, dtago_v)
        dtago_v = jnp.where(hit & (iotaD == 0), slot_hit, dtago_v)

        # insert on E_NEW unless duplicate
        room = d_n < D
        ins = is_new & ~dup & room
        of_dict = is_new & ~dup & ~room
        slot_new = jnp.minimum(d_n, D - 1)

        @pl.when(jnp.any(ins))
        def _():
            for w in range(8):
                cols = slice(w * D, (w + 1) * D)
                dictw[:, cols] = jnp.where(
                    ins & (iotaD == slot_new), tw_frag[w], dictw[:, cols]
                )

        dlens[:, :] = jnp.where(ins & (iotaD == slot_new), length_new,
                                dlens_v)
        drank_v = jnp.where(ins & validD, drank_v + 1, drank_v)
        drank_v = jnp.where(ins & (iotaD == slot_new), 0, drank_v)
        shifted2 = pltpu.roll(dtago_v, 1, axis=1)
        dtago_v = jnp.where(ins & (iotaD > 0), shifted2, dtago_v)
        dtago_v = jnp.where(ins & (iotaD == 0), slot_new, dtago_v)
        drank[:, :] = drank_v
        dtago[:, :] = dtago_v
        ixf[:, :] = jnp.where(ins & (iotaD == slot_new), 1, ixf[:, :])
        d_n2 = d_n + jnp.where(ins, 1, 0)

        # ================= G: context updates (x3.c:99-127) ===========
        pair_n = get_col(R, R_PAIR_N)
        promo0 = get_col(R, R_PROMO0_N)
        promo1 = get_col(R, R_PROMO1_N)
        huge0 = get_col(R, R_HUGE0_N)
        huge1 = get_col(R, R_HUGE1_N)
        f0u, pos0u, _ = rw.row_find(
            rw.FAM0, v0, slot_hit, c0in, c0big, h0t[:, :], h0f[:, :], None,
            hug_scr=c0hug_a, nr2=NR2_0,
        )
        f1u, pos1u, _ = rw.row_find(
            rw.FAM1, v_cur, slot_hit, c1cin, c1cbig, h1t[:, :], h1f[:, :],
            h1p[:, :], hug_scr=c1chug_a, nr2=NR2_1,
        )
        hub0n2, promo0_2, dp0, span0_idx, of0, huge0_2, dg0, gid0 = (
            rw.row_update(
                rw.FAM0, v0, slot_hit, f0u, pos0u, hit, c0in, c0big,
                h0t, h0f, None, hub0n, vc.hub0, promo0, vc.m0,
                hug_scr=c0hug_a, nr2=NR2_0, m=vc.m0, huge_n=huge0,
                huge_cap=vc.h2_0, big_trig=vc.big_trig0,
            )
        )
        hub1n2, promo1_2, dp1, span1_idx, of1, huge1_2, dg1, gid1 = (
            rw.row_update(
                rw.FAM1, v_cur, slot_hit, f1u, pos1u, hit, c1cin, c1cbig,
                h1t, h1f, h1p, hub1n, vc.hub1, promo1, vc.m1,
                # clamped for memory safety past the pairs cap (see the
                # encoder kernel's note; the lane is OF_PAIRS-flagged)
                new_pair_id=jnp.minimum(pair_n, S0 - 1),
                hug_scr=c1chug_a, nr2=NR2_1, m=vc.m1, huge_n=huge1,
                huge_cap=vc.h2_1, big_trig=vc.big_trig1,
            )
        )
        new_pair = hit & ~f1u
        of_pairs = new_pair & (pair_n >= S0)
        pair_n2 = pair_n + jnp.where(new_pair, 1, 0)

        # ================= H: output emit + flush + write-backs =======
        # dictionary entry bytes of the hit slot (pre-insert state; a hit
        # lane never inserts, so dlens_v/dictw post-insert reads would be
        # identical for it — use the pre-insert values for clarity)
        hlen = jnp.sum(jnp.where(iotaD == slot_hit, dlens_v, 0), axis=1,
                       keepdims=True)
        dbytes = []
        for w in range(8):
            dw = jnp.sum(
                jnp.where(iotaD == slot_hit,
                          dictw_v[:, w * D : (w + 1) * D], 0),
                axis=1, keepdims=True,
            )
            for b in range(4):
                dbytes.append((dw >> (8 * b)) & 0xFF)
        dict_bytes = jnp.concatenate(dbytes, axis=1)

        length = jnp.where(is_new, length_new, jnp.where(hit, hlen, 0))
        data32 = jnp.where(is_new, frag32, dict_bytes)
        data32 = jnp.where(iota32c < length, data32, 0)

        opos = get_col(R, R_OPOS)
        out_base = get_col(R, R_OUT_BASE)
        emit = (is_new | hit) & (length > 0)
        of_out = emit & (opos + length > OCAP)
        ok_emit = emit & ~of_out

        off = jnp.where(ok_emit, opos - out_base, 0)
        x = jnp.concatenate(
            [jnp.where(ok_emit, data32, 0), jnp.zeros((L, OBW - MML), I32)],
            axis=1,
        )
        for b in range(9):  # OBW = 512 -> 9-bit barrel shift
            bit = (off >> b) & 1
            rolled = pltpu.roll(x, 1 << b, axis=1)
            x = jnp.where(bit == 1, rolled, x)
        outwin[:, :] = outwin[:, :] + x
        opos2 = opos + jnp.where(ok_emit, length, 0)

        # flush a full OBF-byte half to HBM
        flush = (opos2 - out_base >= OBF) & (out_base + OBF <= obrows * 128)
        xfer[:, :] = set_col(
            set_col(xfer[:, :], XC_FLUSH, flush.astype(I32)),
            XC_FROW, out_base >> 7,
        )

        @pl.when(jnp.any(flush))
        def _():
            for r in range(OBROWS_F):
                stage[:, r, :] = outwin[:, r * 128 : (r + 1) * 128]
            for l in range(L):
                @pl.when(xfer[l, XC_FLUSH] != 0)
                def _(l=l):
                    ro = lane_rowbase(l, obrows) + xfer[l, XC_FROW]
                    pltpu.make_async_copy(
                        stage.at[l], outb.at[pl.ds(ro, OBROWS_F), :],
                        sem_out.at[l],
                    ).start()
            for l in range(L):
                @pl.when(xfer[l, XC_FLUSH] != 0)
                def _(l=l):
                    ro = lane_rowbase(l, obrows) + xfer[l, XC_FROW]
                    pltpu.make_async_copy(
                        stage.at[l], outb.at[pl.ds(ro, OBROWS_F), :],
                        sem_out.at[l],
                    ).wait()

        shifted_out = jnp.concatenate(
            [outwin[:, OBF:], jnp.zeros((L, OBF), I32)], axis=1
        )
        outwin[:, :] = jnp.where(flush, shifted_out, outwin[:, :])
        out_base2 = out_base + jnp.where(flush, OBF, 0)

        # ctx row write-backs (started after updates, waited before the
        # next event's reads)
        wb0 = hit & (cid0 >= 1)
        wb0b = wb0 & (v0.is_big | dp0)
        wb1 = hit & (c1 >= 1)
        wb1b = wb1 & (v_cur.is_big | dp1)
        wb0g = wb0 & (v0.is_huge | dg0) if NR2_0 else None
        wb1g = wb1 & (v_cur.is_huge | dg1) if NR2_1 else None
        # unconditional small-row write-backs (non-hit lanes' scratch is
        # unmodified -> byte-wise no-op; no-fetch lanes target dump rows)
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
                        c0big.at[l], c0r.at[pl.ds(r, PB), :], sem_wb.at[l, 1]
                    ).start()

                @pl.when(xfer[l, XC_WB1B] != 0)
                def _(l=l):
                    r = lane_rowbase(l, R1) + S1 + xfer[l, XC_WB1S] * PB
                    pltpu.make_async_copy(
                        c1cbig.at[l], c1r.at[pl.ds(r, PB), :], sem_wb.at[l, 3]
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
                        c0big.at[l], c0r.at[pl.ds(r, PB), :], sem_wb.at[l, 1]
                    ).wait()

                @pl.when(xfer[l, XC_WB1B] != 0)
                def _(l=l):
                    r = lane_rowbase(l, R1) + S1 + xfer[l, XC_WB1S] * PB
                    pltpu.make_async_copy(
                        c1cbig.at[l], c1r.at[pl.ds(r, PB), :], sem_wb.at[l, 3]
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

        # prev-row cache swap (next event's prev row = this updated cur)
        c1pin[:, 0, :] = jnp.where(
            hit & (c1 >= 1), c1cin[:, 0, :], c1pin[:, 0, :]
        )

        @pl.when(jnp.any(wb1b))
        def _():
            for rr in range(PB):
                c1pbig[:, rr, :] = jnp.where(
                    wb1b, c1cbig[:, rr, :], c1pbig[:, rr, :]
                )

        if NR2_1:
            @pl.when(jnp.any(wb1g))
            def _():
                for rr in range(PB2_1):
                    c1phug[:, rr, :] = jnp.where(
                        wb1g, c1chug[:, rr, :], c1phug[:, rr, :]
                    )

        # ================= advance ====================================
        prev2 = jnp.where(hit, c1, jnp.where(is_new, 0, prev_c1))
        c1_2 = jnp.where(hit, slot_hit, jnp.where(is_new, 0, c1))
        done2 = done | eof | of_out

        of_bits = (
            jnp.where(of_dict, OF_DICT, 0)
            | jnp.where(of0, OF_CTX0, 0)
            | jnp.where(of1, OF_CTX1, 0)
            | jnp.where(of_pairs, OF_PAIRS, 0)
            | jnp.where(of_out, OF_OUT, 0)
        )

        Rn = R
        Rn = set_col(Rn, R_PREV_C1, prev2)
        Rn = set_col(Rn, R_C1, c1_2)
        Rn = set_col(Rn, R_PAIR_N, pair_n2)
        Rn = set_col(Rn, R_DICT_N, d_n2)
        Rn = set_col(Rn, R_AC_LOW, st["low"].astype(I32))
        Rn = set_col(Rn, R_AC_HIGH, st["high"].astype(I32))
        Rn = set_col(Rn, R_AC_BUF, st["buf"].astype(I32))
        Rn = set_col(Rn, R_NBITS, st["bitpos"])
        Rn = set_col(Rn, R_SRC_BASE, src_base2)
        Rn = set_col(Rn, R_OPOS, opos2)
        Rn = set_col(Rn, R_OUT_BASE, out_base2)
        Rn = set_col(Rn, R_HUB0_N, hub0n2)
        Rn = set_col(Rn, R_HUB1_N, hub1n2)
        Rn = set_col(Rn, R_PROMO0_N, promo0_2)
        Rn = set_col(Rn, R_PROMO1_N, promo1_2)
        if NR2_0:
            Rn = set_col(Rn, R_HUGE0_N, huge0_2)
        if NR2_1:
            Rn = set_col(Rn, R_HUGE1_N, huge1_2)
        Rn = set_col(Rn, R_DONE, done2.astype(I32))
        Rn = set_col(Rn, R_OFLOW, get_col(R, R_OFLOW) | of_bits)
        Rn = Rn + counts_add
        regsi[:, :] = Rn

        alive = jnp.sum((~done2).astype(I32)) > 0
        return step + 1, alive

    def cond(carry):
        step, alive = carry
        return (step < nsteps) & alive

    jax.lax.while_loop(cond, event_body, (jnp.int32(0), jnp.bool_(True)))


def build_decoder_call(vc: VMCaps, params: X3Params, nsteps: int, G: int,
                       srows: int, obrows: int):
    """Construct the jitted pallas_call for (vc, params, nsteps, G)."""
    D = vc.dict_cap
    G8 = G * L
    W2 = 2 * FW

    kern = functools.partial(
        decoder_kernel, vc=vc, params=params, nsteps=nsteps,
        srows=srows, obrows=obrows,
    )

    def vspec(width):
        return pl.BlockSpec((L, width), lambda g: (g, 0),
                            memory_space=pltpu.VMEM)

    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    carried_widths = [
        8 * D, D, D, D, D, vc.hub0, vc.hub0, vc.hub1, vc.hub1, vc.hub1,
        128, 128, 256, 128, 128, W2, OBW,
    ]
    in_specs = (
        [anyspec]
        + [vspec(w) for w in carried_widths]
        + [anyspec, anyspec, anyspec]
    )
    out_specs = [vspec(w) for w in carried_widths] + [anyspec] * 3

    out_shape = []
    for i, w in enumerate(carried_widths):
        dt = jnp.float32 if i == 14 else jnp.int32
        out_shape.append(jax.ShapeDtypeStruct((G8, w), dt))
    out_shape.append(jax.ShapeDtypeStruct((G8 * obrows, 128), jnp.int32))
    out_shape.append(jax.ShapeDtypeStruct((G8 * vc.r0, 128), jnp.int32))
    out_shape.append(jax.ShapeDtypeStruct((G8 * vc.r1, 128), jnp.int32))

    scratch = [
        pltpu.VMEM((L, FWROWS, 128), I32),      # sseg
        pltpu.VMEM((L, 1, 128), I32),           # c0in
        pltpu.VMEM((L, PB, 128), I32),          # c0big
        pltpu.VMEM((L, 1, 128), I32),           # c1pin
        pltpu.VMEM((L, PB, 128), I32),          # c1pbig
        pltpu.VMEM((L, 1, 128), I32),           # c1cin
        pltpu.VMEM((L, PB, 128), I32),           # c1cbig
        pltpu.VMEM((L, vc.pb2_0, 128), I32),    # c0hug (1-row dummy if off)
        pltpu.VMEM((L, vc.pb2_1, 128), I32),    # c1phug
        pltpu.VMEM((L, vc.pb2_1, 128), I32),    # c1chug
        pltpu.VMEM((L, OBROWS_F, 128), I32),    # stage
        pltpu.VMEM((L, 128), I32),              # frag_scr
        pltpu.VMEM((L, 128), I32),              # acw
        pltpu.VMEM((L, 128), jnp.float32),      # acwf
        pltpu.VMEM((L, 128), I32),              # xfer
        pltpu.SemaphoreType.DMA((L,)),          # sem_src
        pltpu.SemaphoreType.DMA((L, 9)),        # sem_row
        pltpu.SemaphoreType.DMA((L, 6)),        # sem_wb
        pltpu.SemaphoreType.DMA((L,)),          # sem_out
    ]

    cp = vmem_compiler_params(sum(L * w * 4 for w in carried_widths),
                              scratch)

    def call(srcflat, *state, interpret=False):
        return pl.pallas_call(
            kern,
            grid=(G,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            input_output_aliases={i + 1: i for i in range(20)},
            scratch_shapes=scratch,
            compiler_params=cp,
            interpret=interpret,
        )(srcflat, *state)

    return call
