"""The codec-VM decoder kernel: the whole x3 decode loop in one Pallas
program.

Mirror of kernel.py for the decode direction (x3.c:285-353 semantics, as
modeled by x3tpu/codec.py:_dec_body).  One launch decodes up to ``nsteps``
events per lane of a group; a group is ``SB`` sub-batches of 8 lanes with
fully separate state arrays, emitted phase-major so the sub-batches'
serial AC chains and row DMAs pipeline against each other (see kernel.py
for the sub-batch design).  All adaptive state is identical to the
encoder's (dictionary planes, hub/inline/promoted context rows, dense
model rows) so the two kernels stay in lockstep by construction.  The
decode direction has NO window scan and NO mode-selection probability
sweep — the mode arrives explicitly in the stream (x3.c:150-172 is
encoder-only) — so a decode event is substantially cheaper than its
encode twin.

Per-event phases (per sub-batch):
  A  source-window refill (read-ahead DMA of compressed words)
  B  start ctx1 row DMAs for (prev_c1, c1)        [x3.c:63-67]
  C  decode event symbol via model_events          [x3.c:293]
  D  E_NEW: length + literal bytes (merged loop)   [x3.c:272-283]
  E  hit: pair lookup, ctx0 row DMA, payload decode by mode
                                                   [x3.c:57-129]
  F  dictionary MTF / insert (+ dup lookup)        [x3.c:309-317, 337-348]
  G  context updates + pair registration           [x3.c:99-127]
  H  output emit + flush, row write-backs, advance
"""

from __future__ import annotations

import functools
from types import SimpleNamespace

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
    FLUSH_WORDS, OBF, OBW, OF_CTX0, OF_CTX1, OF_DICT, OF_OUT,
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
from x3tpu.vm import config as _vmc
L = _vmc.LANES  # re-poked by set_active_lanes; never use bare LANES here
MML = MAX_MATCH_LEN
FW = FLUSH_WORDS
FWROWS = FLUSH_WORDS // 128
OBROWS_F = OBF // 128

N_STATE_DEC = 20   # carried state arrays per sub-batch (17 VMEM + 3 HBM)
N_SCR_DEC = 19     # scratch refs per sub-batch (15 VMEM + 4 semaphores)

# xfer scratch columns (vector -> scalar handoffs for DMA addressing)
XC_SREF, XC_SROW = 0, 1
XC_RPREV, XC_RCUR, XC_BPREV, XC_BCUR, XC_RC0, XC_BC0 = 2, 3, 4, 5, 6, 7
XC_WB1R, XC_WB1B, XC_WB1S, XC_WB0R, XC_WB0B, XC_WB0S = 8, 9, 10, 11, 12, 13
XC_FLUSH, XC_FROW = 14, 15
# huge-tier columns (only written when the tier is compiled in)
XC_GPREV, XC_GCUR, XC_GC0 = 16, 17, 18
XC_WB1G, XC_WB1GS, XC_WB0G, XC_WB0GS = 19, 20, 21, 22
# gated dup-probe columns (only written when vc.probe_gate)
XC_DUP, XC_NLEN = 23, 24
XC_DUP2 = 25  # duplicated-phase ablation staging (hw_vm_ablate_dec.py)
# acw scratch columns (AC state bridge across the literal while-loop).
# Cols 4-7 stage each decode's range-division result between the symbol
# search and the interval update (prims.ac_decode_value `stage` hook —
# the L=16 step-remat miscompile fix, hw_l16_dec_inspect 2026-08-20).
AC_LOW, AC_HIGH, AC_BUF, AC_BITPOS = 0, 1, 2, 3
AC_ESTEP, AC_LSTEP, AC_PSTEP, AC_BSTEP = 4, 5, 6, 7
# cols 8-15: per-decode-point udiv qh staging (2 per decode, see
# _stage_seq: ev 8-9, length 10-11, payload 12-13, literal 14-15)

STATE_NAMES_DEC = (
    "dictw", "dlens", "drank", "dtago", "ixf",
    "h0t", "h0f", "h1t", "h1f", "h1p", "ev", "ms", "ch",
    "regsi", "regsf", "srcwin", "outwin", "outb", "c0r", "c1r",
)
SCR_NAMES_DEC = (
    "sseg", "c0in", "c0big", "c1pin", "c1pbig", "c1cin", "c1cbig",
    "c0hug", "c1phug", "c1chug", "stage", "frag_scr", "acw", "acwf",
    "xfer", "sem_src", "sem_row", "sem_wb", "sem_out",
)


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
    *args,
    vc: VMCaps, params: X3Params, nsteps: int, srows: int, obrows: int,
    SB: int = 1, ablate: frozenset = frozenset(),
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

    # Duplicated-phase perf ablations (experiments/hw_vm_ablate_dec.py):
    # decode control flow is stream-driven, so phases are MEASURED BY
    # DUPLICATION instead of removal — the duplicate's inputs are
    # perturbed by a runtime-never-true predicate (OFLOW register < 0;
    # the register is a non-negative bitmask) so CSE can't merge it and
    # DCE can't drop the fold, and its result is folded into an unused
    # regsf column under the same predicate (+0.0 at runtime).  Streams
    # and event counts stay EXACT; (t_dup - t_base) is the phase cost.
    def _dup_pred(b, e):
        return get_col(e.R, R_OFLOW) < 0

    def _dup_fold(b, e, val):
        pz = _dup_pred(b, e)
        b.regsf[:, :] = b.regsf[:, :] + jnp.where(
            (col_iota(128) == 99) & pz, val.astype(F32), 0.0
        )

    # ---- unpack the per-sub-batch argument groups
    srcs = args[:SB]
    ins = args[SB : SB + N_STATE_DEC * SB]
    outs = args[SB + N_STATE_DEC * SB : SB + 2 * N_STATE_DEC * SB]
    scr = args[SB + 2 * N_STATE_DEC * SB :]
    assert len(scr) == N_SCR_DEC * SB
    B = []
    for s in range(SB):
        b = SimpleNamespace()
        b.srcflat = srcs[s]
        for k, name in enumerate(STATE_NAMES_DEC):
            setattr(b, name + "_i", ins[s * N_STATE_DEC + k])
            setattr(b, name, outs[s * N_STATE_DEC + k])
        for k, name in enumerate(SCR_NAMES_DEC):
            setattr(b, name, scr[s * N_SCR_DEC + k])
        B.append(b)

    iota128 = col_iota(128)
    iotaD = col_iota(D)
    iota32c = col_iota(MML)

    def lane_rowbase(l, rper):
        return (g * L + l) * rper

    # carried VMEM state: copy input -> aliased output, use out refs after
    for b in B:
        for name in STATE_NAMES_DEC[:17]:
            getattr(b, name)[:, :] = getattr(b, name + "_i")[:, :]

    # ---- pre-loop: prime the prev-ctx1 row cache (mirror of kernel.py:
    # the loop never fetches the prev row; after a hit the updated cur row
    # is swapped in, after E_NEW prev resets to the hub)
    for b in B:
        R0v = b.regsi[:, :]
        prev0 = get_col(R0v, R_PREV_C1)
        act0 = get_col(R0v, R_DONE) == 0
        rp0 = jnp.where(act0 & (prev0 >= 1), prev0 - 1, -1)
        b.xfer[:, :] = set_col(jnp.zeros((L, 128), I32), XC_RPREV, rp0)
    for b in B:
        for l in range(L):
            @pl.when(b.xfer[l, XC_RPREV] >= 0)
            def _(b=b, l=l):
                r = lane_rowbase(l, R1) + b.xfer[l, XC_RPREV]
                pltpu.make_async_copy(
                    b.c1r.at[pl.ds(r, 1), :], b.c1pin.at[l],
                    b.sem_row.at[l, 0],
                ).start()
    for b in B:
        for l in range(L):
            @pl.when(b.xfer[l, XC_RPREV] >= 0)
            def _(b=b, l=l):
                r = lane_rowbase(l, R1) + b.xfer[l, XC_RPREV]
                pltpu.make_async_copy(
                    b.c1r.at[pl.ds(r, 1), :], b.c1pin.at[l],
                    b.sem_row.at[l, 0],
                ).wait()
    for b in B:
        rp0 = get_col(b.xfer[:, :], XC_RPREV)
        hp0 = b.c1pin[:, 0, 0:1]
        idxp0 = -hp0 - 1
        neg0 = (rp0 >= 0) & (hp0 < 0)
        if NR2_1:
            bp0 = jnp.where(neg0 & (idxp0 < vc.m1), idxp0, -1)
            gp0 = jnp.where(neg0 & (idxp0 >= vc.m1), idxp0 - vc.m1, -1)
            b.xfer[:, :] = set_col(b.xfer[:, :], XC_GPREV, gp0)
        else:
            bp0 = jnp.where(neg0, idxp0, -1)
        b.xfer[:, :] = set_col(b.xfer[:, :], XC_BPREV, bp0)

        @pl.when(jnp.any(bp0 >= 0))
        def _(b=b):
            for l in range(L):
                @pl.when(b.xfer[l, XC_BPREV] >= 0)
                def _(b=b, l=l):
                    r = lane_rowbase(l, R1) + S1 + b.xfer[l, XC_BPREV] * PB
                    pltpu.make_async_copy(
                        b.c1r.at[pl.ds(r, PB), :], b.c1pbig.at[l],
                        b.sem_row.at[l, 1],
                    ).start()
            for l in range(L):
                @pl.when(b.xfer[l, XC_BPREV] >= 0)
                def _(b=b, l=l):
                    r = lane_rowbase(l, R1) + S1 + b.xfer[l, XC_BPREV] * PB
                    pltpu.make_async_copy(
                        b.c1r.at[pl.ds(r, PB), :], b.c1pbig.at[l],
                        b.sem_row.at[l, 1],
                    ).wait()

        if NR2_1:
            gp0 = get_col(b.xfer[:, :], XC_GPREV)

            @pl.when(jnp.any(gp0 >= 0))
            def _(b=b):
                for l in range(L):
                    @pl.when(b.xfer[l, XC_GPREV] >= 0)
                    def _(b=b, l=l):
                        r = (lane_rowbase(l, R1) + S1 + HB1
                             + b.xfer[l, XC_GPREV] * PB2_1)
                        pltpu.make_async_copy(
                            b.c1r.at[pl.ds(r, PB2_1), :], b.c1phug.at[l],
                            b.sem_row.at[l, 4],
                        ).start()
                for l in range(L):
                    @pl.when(b.xfer[l, XC_GPREV] >= 0)
                    def _(b=b, l=l):
                        r = (lane_rowbase(l, R1) + S1 + HB1
                             + b.xfer[l, XC_GPREV] * PB2_1)
                        pltpu.make_async_copy(
                            b.c1r.at[pl.ds(r, PB2_1), :], b.c1phug.at[l],
                            b.sem_row.at[l, 4],
                        ).wait()

    # =======================================================================
    # per-event phase functions (see kernel.py for the sub-batch design)
    # =======================================================================

    def ph_regs(b, e):
        R = b.regsi[:, :]
        e.R = R
        e.done = get_col(R, R_DONE) != 0
        e.active = ~e.done

        # ---- A: source refill decision
        bitpos = get_col(R, R_NBITS)
        src_base = get_col(R, R_SRC_BASE)
        widx = (bitpos >> 5) - src_base
        e.refill = e.active & (widx >= FW)
        e.src_base2 = src_base + jnp.where(e.refill, FW, 0)
        srow = (e.src_base2 + FW) >> 7
        e.can_dma = e.refill & (srow + FWROWS <= srows)

        # ---- B: cur ctx1 row index
        e.prev_c1 = get_col(R, R_PREV_C1)
        e.c1 = get_col(R, R_C1)
        e.rcur = jnp.where(e.active & (e.c1 >= 1), e.c1 - 1, -1)

        xf = b.xfer[:, :]
        xf = set_col(xf, XC_SREF, e.can_dma.astype(I32))
        xf = set_col(xf, XC_SROW, srow)
        xf = set_col(xf, XC_RCUR, jnp.maximum(e.rcur, 0))
        b.xfer[:, :] = xf

    def ph_refill(b, e):
        @pl.when(jnp.any(e.can_dma))
        def _():
            for l in range(L):
                @pl.when(b.xfer[l, XC_SREF] != 0)
                def _(l=l):
                    r = lane_rowbase(l, srows) + b.xfer[l, XC_SROW]
                    pltpu.make_async_copy(
                        b.srcflat.at[pl.ds(r, FWROWS), :], b.sseg.at[l],
                        b.sem_src.at[l],
                    ).start()
            for l in range(L):
                @pl.when(b.xfer[l, XC_SREF] != 0)
                def _(l=l):
                    r = lane_rowbase(l, srows) + b.xfer[l, XC_SROW]
                    pltpu.make_async_copy(
                        b.srcflat.at[pl.ds(r, FWROWS), :], b.sseg.at[l],
                        b.sem_src.at[l],
                    ).wait()

        @pl.when(jnp.any(e.refill))
        def _():
            iota2 = col_iota(2 * FW)
            shifted = jnp.concatenate(
                [b.srcwin[:, FW:], jnp.zeros((L, FW), I32)], axis=1
            )
            merged = shifted
            for r in range(FWROWS):
                lo = FW + r * 128
                placed = jnp.concatenate(
                    [jnp.zeros((L, lo), I32), b.sseg[:, r, :],
                     jnp.zeros((L, 2 * FW - lo - 128), I32)]
                    if lo + 128 < 2 * FW else
                    [jnp.zeros((L, lo), I32), b.sseg[:, r, :]],
                    axis=1,
                )
                merged = jnp.where(
                    e.can_dma & (iota2 >= lo) & (iota2 < lo + 128),
                    placed, merged,
                )
            b.srcwin[:, :] = jnp.where(e.refill, merged, b.srcwin[:, :])

    def ph_cur_start(b, e):
        for l in range(L):
            r = lane_rowbase(l, R1) + b.xfer[l, XC_RCUR]
            pltpu.make_async_copy(
                b.c1r.at[pl.ds(r, 1), :], b.c1cin.at[l], b.sem_row.at[l, 0]
            ).start()

    def _stage_step(b, col):
        """Store-and-reread hook for ac_decode_value's range division
        (the L=16 step-remat miscompile fix; see prims.ac_decode_value).
        acw cols 4-7 stay live until the next event re-stages them -- the
        bridge/loop writes to acw below only touch cols 0-3 (or base on
        the current acw content), so a replayed ref read still sees the
        staged value."""
        def stage(step):
            b.acw[:, :] = set_col(b.acw[:, :], col, step.astype(I32))
            return b.acw[:, col : col + 1].astype(U32)
        return stage

    def _stage_seq(b, base):
        """Factory of single-use staging hooks on consecutive acw
        columns, for ac_decode_value's INNER division intermediates
        (udiv_u32_fast qh): the L=16 miscompile proved the remat hazard
        lives inside the division chain, so the step-level staging alone
        is not enough — each udiv's high-quotient is staged too."""
        state = {"i": 0}

        def factory():
            col = base + state["i"]
            state["i"] += 1

            def hook(x):
                b.acw[:, :] = set_col(b.acw[:, :], col, x.astype(I32))
                return b.acw[:, col : col + 1].astype(U32)

            return hook

        return factory

    def ph_evsym(b, e):
        """C: event symbol (x3.c:293) + E_NEW length; bridge AC state for
        the merged literal loop."""
        # NB: src_base2, not the register value — the refill above already
        # shifted the window, so reads this event must use the new base
        st = dict(_st_of(e.R, b.srcwin[:, :]), src_base=e.src_base2)
        evv = b.ev[:, :]
        e.etot = jnp.sum(evv, axis=1, keepdims=True)
        estep, evalue = prims.ac_decode_value(
            st, e.etot, stage=_stage_step(b, AC_ESTEP),
            stage_qh=_stage_seq(b, 8))
        esym, elow, espan = prims.model_decode(evv, evalue, 128)
        e.esym = jnp.where(e.active, esym, E_EOF)
        st = prims.ac_decode_update(st, estep, elow, espan, e.active)
        b.ev[:, :] = evv + jnp.where((iota128 == e.esym) & e.active, 1, 0)
        e.espan = espan

        e.eof = e.active & (e.esym == E_EOF)
        e.is_new = e.active & (e.esym == E_NEW)
        e.hit = e.active & ~e.eof & ~e.is_new

        # ---- D: E_NEW length
        msv = b.ms[:, :]
        e.mstot = jnp.sum(msv, axis=1, keepdims=True)
        lstep, lvalue = prims.ac_decode_value(
            st, e.mstot, stage=_stage_step(b, AC_LSTEP),
            stage_qh=_stage_seq(b, 10))
        lsym, lslow, lsspan = prims.model_decode(msv, lvalue, 128)
        st = prims.ac_decode_update(st, lstep, lslow, lsspan, e.is_new)
        b.ms[:, :] = msv + jnp.where((iota128 == lsym) & e.is_new, 1, 0)
        e.length_new = jnp.where(e.is_new, lsym + 1, 0)
        e.lsspan = lsspan

        # literal bytes: AC state bridged via scratch
        # bridge write bases on the CURRENT acw (not zeros) so the
        # staged step columns 4-7 survive any replayed ref read
        b.acw[:, :] = set_col(
            set_col(
                set_col(
                    set_col(b.acw[:, :], AC_LOW,
                            st["low"].astype(I32)),
                    AC_HIGH, st["high"].astype(I32)),
                AC_BUF, st["buf"].astype(I32)),
            AC_BITPOS, st["bitpos"],
        )
        b.acwf[:, :] = jnp.zeros((L, 128), F32)
        # frag_scr doubles as the event-scalar materialization point
        # (cols 126/127; fragment bytes use cols 0..31): esym and
        # length_new are long-lived values consumed by every later
        # phase, and Mosaic's rematerialization of such chains across
        # the phase schedule is exactly the round-3 `_pack_words` /
        # winlo failure class (observed again at LANES=16: the FIRST
        # decode event's length arrived corrupted downstream).  A ref
        # store is a hard materialization point; later phases re-read.
        e.kmax = jnp.max(jnp.where(e.is_new, e.length_new, 0))
        b.frag_scr[:, :] = (
            set_col(set_col(jnp.zeros((L, 128), I32), 126, e.esym),
                    127, e.length_new)
        )
        e.st_base = st  # src_base/nwords carried; low/high/buf via acw

        if "ev2" in ablate:  # duplicate the event+length AC decode chains
            pz = _dup_pred(b, e)
            pzi = pz.astype(I32)
            st_d = dict(_st_of(e.R, b.srcwin[:, :]), src_base=e.src_base2)
            es_d, val_d = prims.ac_decode_value(st_d, e.etot + pzi)
            sy_d, lo_d, sp_d = prims.model_decode(evv + pzi, val_d, 128)
            st_d = prims.ac_decode_update(st_d, es_d, lo_d, sp_d, pz)
            ls_d, lv_d = prims.ac_decode_value(st_d, e.mstot + pzi)
            sy2, lo2, sp2 = prims.model_decode(msv + pzi, lv_d, 128)
            st_d = prims.ac_decode_update(st_d, ls_d, lo2, sp2, pz)
            _dup_fold(b, e, sy_d + lo_d + sp_d + sy2 + lo2 + sp2
                      + es_d.astype(I32) + ls_d.astype(I32)
                      + st_d["low"].astype(I32) + st_d["bitpos"])

    def ph_lit_all(E):
        """Merged early-exit literal loop across sub-batches (see
        kernel.py ph_lit_all)."""
        kmax = E[0].kmax
        for e in E[1:]:
            kmax = jnp.maximum(kmax, e.kmax)

        def lit_step(k):
            for b, e in zip(B, E):
                a2 = b.acw[:, :]
                st2 = dict(
                    low=get_col(a2, AC_LOW).astype(U32),
                    high=get_col(a2, AC_HIGH).astype(U32),
                    buf=get_col(a2, AC_BUF).astype(U32),
                    bitpos=get_col(a2, AC_BITPOS),
                    src_base=e.st_base["src_base"],
                    nwords=e.st_base["nwords"],
                    win=b.srcwin[:, :],
                )
                # fresh ref reads of the staged event scalars (see
                # ph_evsym's materialization note)
                esr = b.frag_scr[:, 126:127]
                lnr = b.frag_scr[:, 127:128]
                act = e.active & (esr == E_NEW) & (k < lnr)
                chv = b.ch[:, :]
                btot = jnp.sum(chv, axis=1, keepdims=True)
                bstep, bvalue = prims.ac_decode_value(
                    st2, btot, stage=_stage_step(b, AC_BSTEP),
                    stage_qh=_stage_seq(b, 14))
                bsym, blow, bspan = prims.model_decode(chv, bvalue, 256)
                st2 = prims.ac_decode_update(st2, bstep, blow, bspan, act)
                b.ch[:, :] = chv + jnp.where(
                    (col_iota(256) == bsym) & act, 1, 0
                )
                b.frag_scr[:, :] = jnp.where(
                    (col_iota(128) == k) & act, bsym, b.frag_scr[:, :]
                )
                b.acwf[:, :] = b.acwf[:, :] + jnp.where(
                    (col_iota(128) == 0) & act,
                    prims.bits_f32(bspan, btot), 0.0,
                )
                b.acw[:, :] = set_col(
                    set_col(
                        set_col(
                            set_col(b.acw[:, :], AC_LOW,
                                    st2["low"].astype(I32)),
                            AC_HIGH, st2["high"].astype(I32)),
                        AC_BUF, st2["buf"].astype(I32)),
                    AC_BITPOS, st2["bitpos"],
                )
                if "lit2" in ablate:  # duplicate the literal AC chain
                    pz = _dup_pred(b, e)
                    pzi = pz.astype(I32)
                    st_d = dict(st2)
                    bs_d, bv_d = prims.ac_decode_value(st_d, btot + pzi)
                    by_d, bl_d, bp_d = prims.model_decode(
                        chv + pzi, bv_d, 256)
                    st_d = prims.ac_decode_update(st_d, bs_d, bl_d, bp_d,
                                                  pz)
                    _dup_fold(b, e, by_d + bl_d + bp_d
                              + bs_d.astype(I32)
                              + st_d["low"].astype(I32))
            return k + 1

        jax.lax.while_loop(lambda k: k < kmax, lit_step, jnp.int32(0))

    def ph_lit_tail(b, e):
        a2 = b.acw[:, :]
        e.st = dict(
            e.st_base,
            low=get_col(a2, AC_LOW).astype(U32),
            high=get_col(a2, AC_HIGH).astype(U32),
            buf=get_col(a2, AC_BUF).astype(U32),
            bitpos=get_col(a2, AC_BITPOS),
            win=b.srcwin[:, :],
        )
        e.lit_bits = b.acwf[:, 0:1]
        # rebind the event scalars to their staged ref values so every
        # later phase consumes the materialized copies (ph_evsym note)
        e.esym = b.frag_scr[:, 126:127]
        e.length_new = b.frag_scr[:, 127:128]
        e.eof = e.active & (e.esym == E_EOF)
        e.is_new = e.active & (e.esym == E_NEW)
        e.hit = e.active & ~e.eof & ~e.is_new
        e.frag32 = b.frag_scr[:, :MML]
        e.tw_frag = _pack_words(
            jnp.where(iota32c < e.length_new, e.frag32, 0)
        )

    def ph_spans_pair(b, e):
        """E: wait cur row; promoted spans; pair lookup; start ctx0 DMA."""
        for l in range(L):
            r = lane_rowbase(l, R1) + b.xfer[l, XC_RCUR]
            pltpu.make_async_copy(
                b.c1r.at[pl.ds(r, 1), :], b.c1cin.at[l], b.sem_row.at[l, 0]
            ).wait()

        hc = b.c1cin[:, 0, 0:1]
        idxc = -hc - 1
        negc = (e.rcur >= 0) & (hc < 0)
        if NR2_1:
            bcur = jnp.where(negc & (idxc < vc.m1), idxc, -1)
            gcur = jnp.where(negc & (idxc >= vc.m1), idxc - vc.m1, -1)
        else:
            bcur = jnp.where(negc, idxc, -1)
            gcur = None
        b.xfer[:, :] = set_col(b.xfer[:, :], XC_BCUR, bcur)
        if NR2_1:
            b.xfer[:, :] = set_col(b.xfer[:, :], XC_GCUR, gcur)

        @pl.when(jnp.any(bcur >= 0))
        def _():
            for l in range(L):
                @pl.when(b.xfer[l, XC_BCUR] >= 0)
                def _(l=l):
                    r = lane_rowbase(l, R1) + S1 + b.xfer[l, XC_BCUR] * PB
                    pltpu.make_async_copy(
                        b.c1r.at[pl.ds(r, PB), :], b.c1cbig.at[l],
                        b.sem_row.at[l, 1],
                    ).start()
            for l in range(L):
                @pl.when(b.xfer[l, XC_BCUR] >= 0)
                def _(l=l):
                    r = lane_rowbase(l, R1) + S1 + b.xfer[l, XC_BCUR] * PB
                    pltpu.make_async_copy(
                        b.c1r.at[pl.ds(r, PB), :], b.c1cbig.at[l],
                        b.sem_row.at[l, 1],
                    ).wait()

        if NR2_1:
            @pl.when(jnp.any(gcur >= 0))
            def _():
                for l in range(L):
                    @pl.when(b.xfer[l, XC_GCUR] >= 0)
                    def _(l=l):
                        r = (lane_rowbase(l, R1) + S1 + HB1
                             + b.xfer[l, XC_GCUR] * PB2_1)
                        pltpu.make_async_copy(
                            b.c1r.at[pl.ds(r, PB2_1), :], b.c1chug.at[l],
                            b.sem_row.at[l, 4],
                        ).start()
                for l in range(L):
                    @pl.when(b.xfer[l, XC_GCUR] >= 0)
                    def _(l=l):
                        r = (lane_rowbase(l, R1) + S1 + HB1
                             + b.xfer[l, XC_GCUR] * PB2_1)
                        pltpu.make_async_copy(
                            b.c1r.at[pl.ds(r, PB2_1), :], b.c1chug.at[l],
                            b.sem_row.at[l, 4],
                        ).wait()

        e.hub1n = get_col(e.R, R_HUB1_N)
        e.v_prev = rw.row_view(
            rw.FAM1, e.prev_c1, b.c1pin, b.c1pbig, e.hub1n, e.active,
            hug_scr=b.c1phug if NR2_1 else None, m=vc.m1,
        )
        pair_found, _, pair_id = rw.row_find(
            rw.FAM1, e.v_prev, e.c1, b.c1pin, b.c1pbig, b.h1t[:, :],
            b.h1f[:, :], b.h1p[:, :],
            hug_scr=b.c1phug if NR2_1 else None, nr2=NR2_1,
        )
        e.cid0 = jnp.where(pair_found & e.active, pair_id, 0)

        e.rc0 = jnp.where(e.active & (e.cid0 >= 1), e.cid0 - 1, -1)
        b.xfer[:, :] = set_col(b.xfer[:, :], XC_RC0, jnp.maximum(e.rc0, 0))
        for l in range(L):
            r = lane_rowbase(l, R0) + b.xfer[l, XC_RC0]
            pltpu.make_async_copy(
                b.c0r.at[pl.ds(r, 1), :], b.c0in.at[l], b.sem_row.at[l, 2]
            ).start()

    def ph_wait_c0(b, e):
        for l in range(L):
            r = lane_rowbase(l, R0) + b.xfer[l, XC_RC0]
            pltpu.make_async_copy(
                b.c0r.at[pl.ds(r, 1), :], b.c0in.at[l], b.sem_row.at[l, 2]
            ).wait()
        h0 = b.c0in[:, 0, 0:1]
        idx0 = -h0 - 1
        neg0c = (e.rc0 >= 0) & (h0 < 0)
        if NR2_0:
            bc0 = jnp.where(neg0c & (idx0 < vc.m0), idx0, -1)
            gc0 = jnp.where(neg0c & (idx0 >= vc.m0), idx0 - vc.m0, -1)
        else:
            bc0 = jnp.where(neg0c, idx0, -1)
            gc0 = None
        b.xfer[:, :] = set_col(b.xfer[:, :], XC_BC0, bc0)
        if NR2_0:
            b.xfer[:, :] = set_col(b.xfer[:, :], XC_GC0, gc0)

        @pl.when(jnp.any(bc0 >= 0))
        def _():
            for l in range(L):
                @pl.when(b.xfer[l, XC_BC0] >= 0)
                def _(l=l):
                    r = lane_rowbase(l, R0) + S0 + b.xfer[l, XC_BC0] * PB
                    pltpu.make_async_copy(
                        b.c0r.at[pl.ds(r, PB), :], b.c0big.at[l],
                        b.sem_row.at[l, 3],
                    ).start()
            for l in range(L):
                @pl.when(b.xfer[l, XC_BC0] >= 0)
                def _(l=l):
                    r = lane_rowbase(l, R0) + S0 + b.xfer[l, XC_BC0] * PB
                    pltpu.make_async_copy(
                        b.c0r.at[pl.ds(r, PB), :], b.c0big.at[l],
                        b.sem_row.at[l, 3],
                    ).wait()

        if NR2_0:
            @pl.when(jnp.any(gc0 >= 0))
            def _():
                for l in range(L):
                    @pl.when(b.xfer[l, XC_GC0] >= 0)
                    def _(l=l):
                        r = (lane_rowbase(l, R0) + S0 + HB0
                             + b.xfer[l, XC_GC0] * PB2_0)
                        pltpu.make_async_copy(
                            b.c0r.at[pl.ds(r, PB2_0), :], b.c0hug.at[l],
                            b.sem_row.at[l, 5],
                        ).start()
                for l in range(L):
                    @pl.when(b.xfer[l, XC_GC0] >= 0)
                    def _(l=l):
                        r = (lane_rowbase(l, R0) + S0 + HB0
                             + b.xfer[l, XC_GC0] * PB2_0)
                        pltpu.make_async_copy(
                            b.c0r.at[pl.ds(r, PB2_0), :], b.c0hug.at[l],
                            b.sem_row.at[l, 5],
                        ).wait()

    def ph_payload(b, e):
        """E: payload decode by mode (x3.c:57-129) + stats mirror."""
        hub0n = get_col(e.R, R_HUB0_N)
        e.v0 = rw.row_view(rw.FAM0, e.cid0, b.c0in, b.c0big, hub0n,
                           e.active,
                           hug_scr=b.c0hug if NR2_0 else None, m=vc.m0)
        e.v_cur = rw.row_view(rw.FAM1, e.c1, b.c1cin, b.c1cbig, e.hub1n,
                              e.active,
                              hug_scr=b.c1chug if NR2_1 else None, m=vc.m1)

        is0 = e.hit & (e.esym == E_CTX0)
        is1 = e.hit & (e.esym == E_CTX1)
        e.isx = e.hit & (e.esym == E_IDX1)

        _, _, tot0 = rw.row_stats(
            rw.FAM0, e.v0, jnp.zeros((L, 1), I32), b.c0in, b.c0big,
            b.h0f[:, :], hug_scr=b.c0hug if NR2_0 else None, nr2=NR2_0,
        )
        _, _, tot1 = rw.row_stats(
            rw.FAM1, e.v_cur, jnp.zeros((L, 1), I32), b.c1cin, b.c1cbig,
            b.h1f[:, :], hug_scr=b.c1chug if NR2_1 else None, nr2=NR2_1,
        )
        # ixf is the index model as INCLUSIVE cumulative freqs (see the
        # encoder's ph_mode note): total = static tail slice, and the
        # interval search below needs no cumsum
        ixv = b.ixf[:, :]
        ixtot = ixv[:, D - 1 : D]
        ptot = jnp.where(is0, tot0, jnp.where(is1, tot1, ixtot))
        ptot = jnp.maximum(ptot, 1)
        pstep, pvalue = prims.ac_decode_value(
            e.st, ptot, stage=_stage_step(b, AC_PSTEP),
            stage_qh=_stage_seq(b, 12))
        pos0d, tag0d, low0d, span0d = rw.row_decode_pos(
            rw.FAM0, e.v0, pvalue, b.c0in, b.c0big, b.h0f[:, :],
            b.h0t[:, :], hug_scr=b.c0hug if NR2_0 else None, nr2=NR2_0,
        )
        pos1d, tag1d, low1d, span1d = rw.row_decode_pos(
            rw.FAM1, e.v_cur, pvalue, b.c1cin, b.c1cbig, b.h1f[:, :],
            b.h1t[:, :], hug_scr=b.c1chug if NR2_1 else None, nr2=NR2_1,
        )
        rankd, ixlowd, ixspand = prims.model_decode_cum(ixv, pvalue, D)
        e.dtago_v0 = b.dtago[:, :]
        slot_x = jnp.sum(jnp.where(iotaD == rankd, e.dtago_v0, 0), axis=1,
                         keepdims=True)

        e.slot_hit = jnp.where(is0, tag0d, jnp.where(is1, tag1d, slot_x))
        plow = jnp.where(is0, low0d, jnp.where(is1, low1d, ixlowd))
        pspan = jnp.where(is0, span0d, jnp.where(is1, span1d, ixspand))
        e.st = prims.ac_decode_update(e.st, pstep, plow, pspan, e.hit)
        # cumulative ixf: freq[rank] += 1 is +1 on every column >= rank
        b.ixf[:, :] = ixv + jnp.where((iotaD >= rankd) & e.isx, 1, 0)
        e.rankd = rankd

        if "pay2" in ablate:  # duplicate the payload searches (perf probe)
            pzu = _dup_pred(b, e).astype(I32).astype(jnp.uint32)
            pv2 = pvalue + pzu
            r2, l2, s2 = prims.model_decode_cum(ixv, pv2, D)
            p0b, t0b, l0b, s0b = rw.row_decode_pos(
                rw.FAM0, e.v0, pv2, b.c0in, b.c0big, b.h0f[:, :],
                b.h0t[:, :], hug_scr=b.c0hug if NR2_0 else None, nr2=NR2_0,
            )
            p1b, t1b, l1b, s1b = rw.row_decode_pos(
                rw.FAM1, e.v_cur, pv2, b.c1cin, b.c1cbig, b.h1f[:, :],
                b.h1t[:, :], hug_scr=b.c1chug if NR2_1 else None,
                nr2=NR2_1,
            )
            _dup_fold(b, e, r2 + l2 + s2 + p0b + t0b + l0b + s0b
                      + p1b + t1b + l1b + s1b)

        if "row2" in ablate:  # duplicate the row find/stats (perf probe)
            tg2 = e.slot_hit + _dup_pred(b, e).astype(I32)
            f0x, p0x, _ = rw.row_find(
                rw.FAM0, e.v0, tg2, b.c0in, b.c0big, b.h0t[:, :],
                b.h0f[:, :], None,
                hug_scr=b.c0hug if NR2_0 else None, nr2=NR2_0,
            )
            f1x, p1x, _ = rw.row_find(
                rw.FAM1, e.v_cur, tg2, b.c1cin, b.c1cbig, b.h1t[:, :],
                b.h1f[:, :], b.h1p[:, :],
                hug_scr=b.c1chug if NR2_1 else None, nr2=NR2_1,
            )
            l0x, s0x, t0x = rw.row_stats(
                rw.FAM0, e.v0, p0x, b.c0in, b.c0big, b.h0f[:, :],
                hug_scr=b.c0hug if NR2_0 else None, nr2=NR2_0,
            )
            l1x, s1x, t1x = rw.row_stats(
                rw.FAM1, e.v_cur, p1x, b.c1cin, b.c1cbig, b.h1f[:, :],
                hug_scr=b.c1chug if NR2_1 else None, nr2=NR2_1,
            )
            _dup_fold(b, e, p0x + p1x + l0x + l1x + s0x + s1x + t0x + t1x
                      + f0x.astype(I32) + f1x.astype(I32))

        # stats mirror (x3.c:294, 78-96, 275-281)
        ev_bits = prims.bits_f32(e.espan, e.etot)
        ms_bits = prims.bits_f32(e.lsspan, e.mstot)
        pay_bits = prims.bits_f32(pspan, ptot)
        add_bits = jnp.where(
            e.hit, ev_bits + pay_bits,
            jnp.where(e.is_new, ev_bits + ms_bits + e.lit_bits,
                      jnp.where(e.eof, ev_bits, 0.0)),
        )
        b.regsf[:, :] = b.regsf[:, :] + jnp.where(
            iota128 == e.esym, add_bits, 0.0
        )
        # E_EOF is never counted (matches the reference and the encoder)
        e.counts_add = jnp.where(
            (iota128 == R_COUNTS + e.esym) & e.active & (e.esym != E_EOF),
            1, 0,
        )

    def ph_dict(b, e):
        """F: dictionary MTF / insert (x3.c:309-317, 337-348)."""
        e.d_n = get_col(e.R, R_DICT_N)
        e.dictw_v = b.dictw[:, :]
        e.dlens_v = b.dlens[:, :]
        drank_v = b.drank[:, :]
        dtago_v = e.dtago_v0
        validD = iotaD < e.d_n

        # dup lookup of the decoded fragment (pre-insert state)
        if vc.probe_gate:
            # large-D tier (round-3 verdict #3/#5): the dup probe is an
            # O(D) dense compare needed only for E_NEW events (~3% of
            # events in the measured 4 MB regime) — gate the WHOLE probe
            # on any lane decoding one.  The result and the fragment
            # length stage through xfer columns across the pl.when;
            # everything read inside is a fresh ref read.
            b.xfer[:, :] = set_col(
                set_col(b.xfer[:, :], XC_DUP, jnp.zeros((L, 1), I32)),
                XC_NLEN, e.length_new,
            )

            @pl.when(jnp.any(e.is_new))
            def _():
                ln2 = get_col(b.xfer[:, :], XC_NLEN)
                frag = b.frag_scr[:, :MML]
                twf = _pack_words(jnp.where(iota32c < ln2, frag, 0))
                fm = _probe_matchlen(b.dictw[:, :], twf, D)
                dls = b.dlens[:, :]
                d_nv = get_col(b.regsi[:, :], R_DICT_N)
                dup_v = jnp.any(
                    (iotaD < d_nv) & (ln2 > 0) & (dls == ln2)
                    & (fm >= ln2),
                    axis=1, keepdims=True,
                )
                b.xfer[:, :] = set_col(b.xfer[:, :], XC_DUP,
                                       dup_v.astype(I32))

            dup = (get_col(b.xfer[:, :], XC_DUP) != 0) & e.is_new
        else:
            frag_mlen = _probe_matchlen(e.dictw_v, e.tw_frag, D)
            dup = jnp.any(
                validD & (e.dlens_v == e.length_new)
                & (frag_mlen >= e.length_new) & e.is_new,
                axis=1, keepdims=True,
            )

        if "dup2" in ablate:  # duplicate the dup probe (perf probe)
            pz = _dup_pred(b, e)
            lnx = e.length_new + pz.astype(I32)
            if vc.probe_gate:
                b.xfer[:, :] = set_col(b.xfer[:, :], XC_DUP2,
                                       jnp.zeros((L, 1), I32))

                @pl.when(jnp.any(e.is_new))
                def _():
                    lnz = get_col(b.xfer[:, :], XC_NLEN) + (
                        get_col(b.regsi[:, :], R_OFLOW) < 0
                    ).astype(I32)
                    twz = _pack_words(
                        jnp.where(iota32c < lnz, b.frag_scr[:, :MML], 0)
                    )
                    fmz = _probe_matchlen(b.dictw[:, :], twz, D)
                    dz = jnp.any(
                        (iotaD < get_col(b.regsi[:, :], R_DICT_N))
                        & (lnz > 0) & (b.dlens[:, :] == lnz) & (fmz >= lnz),
                        axis=1, keepdims=True,
                    )
                    b.xfer[:, :] = set_col(b.xfer[:, :], XC_DUP2,
                                           dz.astype(I32))

                _dup_fold(b, e, get_col(b.xfer[:, :], XC_DUP2))
            else:
                twx = _pack_words(
                    jnp.where(iota32c < lnx, b.frag_scr[:, :MML], 0)
                )
                fmx = _probe_matchlen(e.dictw_v, twx, D)
                dx = jnp.any(
                    validD & (e.dlens_v == lnx) & (fmx >= lnx),
                    axis=1, keepdims=True,
                )
                _dup_fold(b, e, dx.astype(I32))

        # MTF of the hit slot (rank = recency rank of slot_hit)
        rank_mtf = jnp.sum(jnp.where(iotaD == e.slot_hit, drank_v, 0),
                           axis=1, keepdims=True)

        if "mtf2" in ablate:  # duplicate the hit-MTF chain (perf probe)
            pz = _dup_pred(b, e)
            rk2 = rank_mtf + pz.astype(I32)
            bm2 = validD & e.hit & (drank_v < rk2)
            dr2 = jnp.where(bm2, drank_v + 1, drank_v)
            dr2 = jnp.where((iotaD == e.slot_hit) & e.hit, 0, dr2)
            sh2x = pltpu.roll(dtago_v, 1, axis=1)
            dt2 = jnp.where(e.hit & (iotaD <= rk2), sh2x, dtago_v)
            dt2 = jnp.where(e.hit & (iotaD == 0), e.slot_hit, dt2)
            _dup_fold(b, e, jnp.sum(dr2 + dt2, axis=1, keepdims=True))
        bump = validD & e.hit & (drank_v < rank_mtf)
        drank_v = jnp.where(bump, drank_v + 1, drank_v)
        drank_v = jnp.where((iotaD == e.slot_hit) & e.hit, 0, drank_v)
        shifted = pltpu.roll(dtago_v, 1, axis=1)
        dtago_v = jnp.where(e.hit & (iotaD <= rank_mtf), shifted, dtago_v)
        dtago_v = jnp.where(e.hit & (iotaD == 0), e.slot_hit, dtago_v)

        # insert on E_NEW unless duplicate
        room = e.d_n < D
        ins = e.is_new & ~dup & room
        e.of_dict = e.is_new & ~dup & ~room
        slot_new = jnp.minimum(e.d_n, D - 1)

        @pl.when(jnp.any(ins))
        def _():
            for w in range(8):
                cols = slice(w * D, (w + 1) * D)
                b.dictw[:, cols] = jnp.where(
                    ins & (iotaD == slot_new), e.tw_frag[w],
                    b.dictw[:, cols],
                )

        b.dlens[:, :] = jnp.where(ins & (iotaD == slot_new), e.length_new,
                                  e.dlens_v)
        drank_v = jnp.where(ins & validD, drank_v + 1, drank_v)
        drank_v = jnp.where(ins & (iotaD == slot_new), 0, drank_v)
        shifted2 = pltpu.roll(dtago_v, 1, axis=1)
        dtago_v = jnp.where(ins & (iotaD > 0), shifted2, dtago_v)
        dtago_v = jnp.where(ins & (iotaD == 0), slot_new, dtago_v)
        b.drank[:, :] = drank_v
        b.dtago[:, :] = dtago_v
        # cumulative ixf: a freq-1 append adds 1 to every column >= slot
        b.ixf[:, :] = b.ixf[:, :] + jnp.where(ins & (iotaD >= slot_new),
                                              1, 0)
        e.d_n2 = e.d_n + jnp.where(ins, 1, 0)

    def ph_ctx(b, e):
        """G: context updates (x3.c:99-127)."""
        pair_n = get_col(e.R, R_PAIR_N)
        promo0 = get_col(e.R, R_PROMO0_N)
        promo1 = get_col(e.R, R_PROMO1_N)
        huge0 = get_col(e.R, R_HUGE0_N)
        huge1 = get_col(e.R, R_HUGE1_N)
        f0u, pos0u, _ = rw.row_find(
            rw.FAM0, e.v0, e.slot_hit, b.c0in, b.c0big, b.h0t[:, :],
            b.h0f[:, :], None,
            hug_scr=b.c0hug if NR2_0 else None, nr2=NR2_0,
        )
        f1u, pos1u, _ = rw.row_find(
            rw.FAM1, e.v_cur, e.slot_hit, b.c1cin, b.c1cbig, b.h1t[:, :],
            b.h1f[:, :], b.h1p[:, :],
            hug_scr=b.c1chug if NR2_1 else None, nr2=NR2_1,
        )
        (e.hub0n2, e.promo0_2, dp0, e.span0_idx, of0, e.huge0_2, dg0,
         e.gid0) = rw.row_update(
            rw.FAM0, e.v0, e.slot_hit, f0u, pos0u, e.hit, b.c0in, b.c0big,
            b.h0t, b.h0f, None, get_col(e.R, R_HUB0_N), vc.hub0, promo0,
            vc.m0,
            hug_scr=b.c0hug if NR2_0 else None, nr2=NR2_0, m=vc.m0,
            huge_n=huge0, huge_cap=vc.h2_0, big_trig=vc.big_trig0,
        )
        (e.hub1n2, e.promo1_2, dp1, e.span1_idx, of1, e.huge1_2, dg1,
         e.gid1) = rw.row_update(
            rw.FAM1, e.v_cur, e.slot_hit, f1u, pos1u, e.hit, b.c1cin,
            b.c1cbig, b.h1t, b.h1f, b.h1p, e.hub1n, vc.hub1, promo1,
            vc.m1,
            # clamped for memory safety past the pairs cap (see the
            # encoder kernel's note; the lane is OF_PAIRS-flagged)
            new_pair_id=jnp.minimum(pair_n, S0 - 1),
            hug_scr=b.c1chug if NR2_1 else None, nr2=NR2_1, m=vc.m1,
            huge_n=huge1, huge_cap=vc.h2_1, big_trig=vc.big_trig1,
        )
        new_pair = e.hit & ~f1u
        e.of_pairs = new_pair & (pair_n >= S0)
        e.pair_n2 = pair_n + jnp.where(new_pair, 1, 0)
        e.of0, e.of1 = of0, of1
        e.dp0, e.dp1, e.dg0, e.dg1 = dp0, dp1, dg0, dg1

    def ph_emit(b, e):
        """H: output emit + flush."""
        # dictionary entry bytes of the hit slot (pre-insert state; a hit
        # lane never inserts, so dlens_v/dictw post-insert reads would be
        # identical for it — use the pre-insert values for clarity)
        hlen = jnp.sum(jnp.where(iotaD == e.slot_hit, e.dlens_v, 0),
                       axis=1, keepdims=True)
        dbytes = []
        for w in range(8):
            dw = jnp.sum(
                jnp.where(iotaD == e.slot_hit,
                          e.dictw_v[:, w * D : (w + 1) * D], 0),
                axis=1, keepdims=True,
            )
            for bb in range(4):
                dbytes.append((dw >> (8 * bb)) & 0xFF)
        dict_bytes = jnp.concatenate(dbytes, axis=1)

        length = jnp.where(e.is_new, e.length_new,
                           jnp.where(e.hit, hlen, 0))
        data32 = jnp.where(e.is_new, e.frag32, dict_bytes)
        data32 = jnp.where(iota32c < length, data32, 0)

        opos = get_col(e.R, R_OPOS)
        out_base = get_col(e.R, R_OUT_BASE)
        emit = (e.is_new | e.hit) & (length > 0)
        e.of_out = emit & (opos + length > OCAP)
        ok_emit = emit & ~e.of_out

        off = jnp.where(ok_emit, opos - out_base, 0)
        x = jnp.concatenate(
            [jnp.where(ok_emit, data32, 0),
             jnp.zeros((L, OBW - MML), I32)],
            axis=1,
        )
        for bb in range(9):  # OBW = 512 -> 9-bit barrel shift
            bit = (off >> bb) & 1
            rolled = pltpu.roll(x, 1 << bb, axis=1)
            x = jnp.where(bit == 1, rolled, x)
        b.outwin[:, :] = b.outwin[:, :] + x
        e.opos2 = opos + jnp.where(ok_emit, length, 0)

        if "emit2" in ablate:  # duplicate extraction + shift (perf probe)
            pz = _dup_pred(b, e)
            sl2 = e.slot_hit + pz.astype(I32)
            db2 = []
            for w in range(8):
                dw2 = jnp.sum(
                    jnp.where(iotaD == sl2,
                              e.dictw_v[:, w * D : (w + 1) * D], 0),
                    axis=1, keepdims=True,
                )
                for bb in range(4):
                    db2.append((dw2 >> (8 * bb)) & 0xFF)
            x2 = jnp.concatenate(
                [jnp.concatenate(db2, axis=1),
                 jnp.zeros((L, OBW - MML), I32)], axis=1,
            )
            off2 = off + pz.astype(I32)
            for bb in range(9):
                bit2 = (off2 >> bb) & 1
                rolled2 = pltpu.roll(x2, 1 << bb, axis=1)
                x2 = jnp.where(bit2 == 1, rolled2, x2)
            _dup_fold(b, e, jnp.sum(x2, axis=1, keepdims=True))

        # flush a full OBF-byte half to HBM
        flush = (e.opos2 - out_base >= OBF) & (
            out_base + OBF <= obrows * 128
        )
        b.xfer[:, :] = set_col(
            set_col(b.xfer[:, :], XC_FLUSH, flush.astype(I32)),
            XC_FROW, out_base >> 7,
        )

        @pl.when(jnp.any(flush))
        def _():
            for r in range(OBROWS_F):
                b.stage[:, r, :] = b.outwin[:, r * 128 : (r + 1) * 128]
            for l in range(L):
                @pl.when(b.xfer[l, XC_FLUSH] != 0)
                def _(l=l):
                    ro = lane_rowbase(l, obrows) + b.xfer[l, XC_FROW]
                    pltpu.make_async_copy(
                        b.stage.at[l], b.outb.at[pl.ds(ro, OBROWS_F), :],
                        b.sem_out,
                    ).start()
            for l in range(L):
                @pl.when(b.xfer[l, XC_FLUSH] != 0)
                def _(l=l):
                    ro = lane_rowbase(l, obrows) + b.xfer[l, XC_FROW]
                    pltpu.make_async_copy(
                        b.stage.at[l], b.outb.at[pl.ds(ro, OBROWS_F), :],
                        b.sem_out,
                    ).wait()

        shifted_out = jnp.concatenate(
            [b.outwin[:, OBF:], jnp.zeros((L, OBF), I32)], axis=1
        )
        b.outwin[:, :] = jnp.where(flush, shifted_out, b.outwin[:, :])
        e.out_base2 = out_base + jnp.where(flush, OBF, 0)

    def ph_wb_start(b, e):
        """H: ctx row write-back starts (waited before next event)."""
        wb0 = e.hit & (e.cid0 >= 1)
        e.wb0b = wb0 & (e.v0.is_big | e.dp0)
        wb1 = e.hit & (e.c1 >= 1)
        e.wb1b = wb1 & (e.v_cur.is_big | e.dp1)
        e.wb0g = wb0 & (e.v0.is_huge | e.dg0) if NR2_0 else None
        e.wb1g = wb1 & (e.v_cur.is_huge | e.dg1) if NR2_1 else None
        wb0r = jnp.where(e.rc0 >= 0, e.rc0, vc.dump0)
        wb1r = jnp.where(e.rcur >= 0, e.rcur, vc.dump1)
        xf = b.xfer[:, :]
        xf = set_col(xf, XC_WB0R, wb0r)
        xf = set_col(xf, XC_WB0B, e.wb0b.astype(I32))
        xf = set_col(xf, XC_WB0S, e.span0_idx)
        xf = set_col(xf, XC_WB1R, wb1r)
        xf = set_col(xf, XC_WB1B, e.wb1b.astype(I32))
        xf = set_col(xf, XC_WB1S, e.span1_idx)
        if NR2_0:
            xf = set_col(xf, XC_WB0G, e.wb0g.astype(I32))
            xf = set_col(xf, XC_WB0GS, e.gid0)
        if NR2_1:
            xf = set_col(xf, XC_WB1G, e.wb1g.astype(I32))
            xf = set_col(xf, XC_WB1GS, e.gid1)
        b.xfer[:, :] = xf
        e.any_wbb = jnp.any(e.wb0b | e.wb1b)
        if NR2_0 or NR2_1:
            wbg_acc = jnp.zeros((L, 1), jnp.bool_)
            if NR2_0:
                wbg_acc = wbg_acc | e.wb0g
            if NR2_1:
                wbg_acc = wbg_acc | e.wb1g
            e.any_wbg = jnp.any(wbg_acc)
        for l in range(L):
            r = lane_rowbase(l, R0) + b.xfer[l, XC_WB0R]
            pltpu.make_async_copy(
                b.c0in.at[l], b.c0r.at[pl.ds(r, 1), :], b.sem_wb.at[0]
            ).start()
            r1w = lane_rowbase(l, R1) + b.xfer[l, XC_WB1R]
            pltpu.make_async_copy(
                b.c1cin.at[l], b.c1r.at[pl.ds(r1w, 1), :], b.sem_wb.at[2]
            ).start()

        @pl.when(e.any_wbb)
        def _():
            for l in range(L):
                @pl.when(b.xfer[l, XC_WB0B] != 0)
                def _(l=l):
                    r = lane_rowbase(l, R0) + S0 + b.xfer[l, XC_WB0S] * PB
                    pltpu.make_async_copy(
                        b.c0big.at[l], b.c0r.at[pl.ds(r, PB), :],
                        b.sem_wb.at[1],
                    ).start()

                @pl.when(b.xfer[l, XC_WB1B] != 0)
                def _(l=l):
                    r = lane_rowbase(l, R1) + S1 + b.xfer[l, XC_WB1S] * PB
                    pltpu.make_async_copy(
                        b.c1cbig.at[l], b.c1r.at[pl.ds(r, PB), :],
                        b.sem_wb.at[3],
                    ).start()

        if NR2_0 or NR2_1:
            @pl.when(e.any_wbg)
            def _():
                for l in range(L):
                    if NR2_0:
                        @pl.when(b.xfer[l, XC_WB0G] != 0)
                        def _(l=l):
                            r = (lane_rowbase(l, R0) + S0 + HB0
                                 + b.xfer[l, XC_WB0GS] * PB2_0)
                            pltpu.make_async_copy(
                                b.c0hug.at[l],
                                b.c0r.at[pl.ds(r, PB2_0), :],
                                b.sem_wb.at[4],
                            ).start()
                    if NR2_1:
                        @pl.when(b.xfer[l, XC_WB1G] != 0)
                        def _(l=l):
                            r = (lane_rowbase(l, R1) + S1 + HB1
                                 + b.xfer[l, XC_WB1GS] * PB2_1)
                            pltpu.make_async_copy(
                                b.c1chug.at[l],
                                b.c1r.at[pl.ds(r, PB2_1), :],
                                b.sem_wb.at[5],
                            ).start()

    def ph_wb_wait(b, e):
        for l in range(L):
            r = lane_rowbase(l, R0) + b.xfer[l, XC_WB0R]
            pltpu.make_async_copy(
                b.c0in.at[l], b.c0r.at[pl.ds(r, 1), :], b.sem_wb.at[0]
            ).wait()
            r1w = lane_rowbase(l, R1) + b.xfer[l, XC_WB1R]
            pltpu.make_async_copy(
                b.c1cin.at[l], b.c1r.at[pl.ds(r1w, 1), :], b.sem_wb.at[2]
            ).wait()

        @pl.when(e.any_wbb)
        def _():
            for l in range(L):
                @pl.when(b.xfer[l, XC_WB0B] != 0)
                def _(l=l):
                    r = lane_rowbase(l, R0) + S0 + b.xfer[l, XC_WB0S] * PB
                    pltpu.make_async_copy(
                        b.c0big.at[l], b.c0r.at[pl.ds(r, PB), :],
                        b.sem_wb.at[1],
                    ).wait()

                @pl.when(b.xfer[l, XC_WB1B] != 0)
                def _(l=l):
                    r = lane_rowbase(l, R1) + S1 + b.xfer[l, XC_WB1S] * PB
                    pltpu.make_async_copy(
                        b.c1cbig.at[l], b.c1r.at[pl.ds(r, PB), :],
                        b.sem_wb.at[3],
                    ).wait()

        if NR2_0 or NR2_1:
            @pl.when(e.any_wbg)
            def _():
                for l in range(L):
                    if NR2_0:
                        @pl.when(b.xfer[l, XC_WB0G] != 0)
                        def _(l=l):
                            r = (lane_rowbase(l, R0) + S0 + HB0
                                 + b.xfer[l, XC_WB0GS] * PB2_0)
                            pltpu.make_async_copy(
                                b.c0hug.at[l],
                                b.c0r.at[pl.ds(r, PB2_0), :],
                                b.sem_wb.at[4],
                            ).wait()
                    if NR2_1:
                        @pl.when(b.xfer[l, XC_WB1G] != 0)
                        def _(l=l):
                            r = (lane_rowbase(l, R1) + S1 + HB1
                                 + b.xfer[l, XC_WB1GS] * PB2_1)
                            pltpu.make_async_copy(
                                b.c1chug.at[l],
                                b.c1r.at[pl.ds(r, PB2_1), :],
                                b.sem_wb.at[5],
                            ).wait()

    def ph_advance(b, e):
        # prev-row cache swap (next event's prev row = this updated cur)
        b.c1pin[:, 0, :] = jnp.where(
            e.hit & (e.c1 >= 1), b.c1cin[:, 0, :], b.c1pin[:, 0, :]
        )

        @pl.when(jnp.any(e.wb1b))
        def _():
            for rr in range(PB):
                b.c1pbig[:, rr, :] = jnp.where(
                    e.wb1b, b.c1cbig[:, rr, :], b.c1pbig[:, rr, :]
                )

        if NR2_1:
            @pl.when(jnp.any(e.wb1g))
            def _():
                for rr in range(PB2_1):
                    b.c1phug[:, rr, :] = jnp.where(
                        e.wb1g, b.c1chug[:, rr, :], b.c1phug[:, rr, :]
                    )

        prev2 = jnp.where(e.hit, e.c1, jnp.where(e.is_new, 0, e.prev_c1))
        c1_2 = jnp.where(e.hit, e.slot_hit, jnp.where(e.is_new, 0, e.c1))
        done2 = e.done | e.eof | e.of_out

        of_bits = (
            jnp.where(e.of_dict, OF_DICT, 0)
            | jnp.where(e.of0, OF_CTX0, 0)
            | jnp.where(e.of1, OF_CTX1, 0)
            | jnp.where(e.of_pairs, OF_PAIRS, 0)
            | jnp.where(e.of_out, OF_OUT, 0)
        )

        Rn = e.R
        Rn = set_col(Rn, R_PREV_C1, prev2)
        Rn = set_col(Rn, R_C1, c1_2)
        Rn = set_col(Rn, R_PAIR_N, e.pair_n2)
        Rn = set_col(Rn, R_DICT_N, e.d_n2)
        Rn = set_col(Rn, R_AC_LOW, e.st["low"].astype(I32))
        Rn = set_col(Rn, R_AC_HIGH, e.st["high"].astype(I32))
        Rn = set_col(Rn, R_AC_BUF, e.st["buf"].astype(I32))
        Rn = set_col(Rn, R_NBITS, e.st["bitpos"])
        Rn = set_col(Rn, R_SRC_BASE, e.src_base2)
        Rn = set_col(Rn, R_OPOS, e.opos2)
        Rn = set_col(Rn, R_OUT_BASE, e.out_base2)
        Rn = set_col(Rn, R_HUB0_N, e.hub0n2)
        Rn = set_col(Rn, R_HUB1_N, e.hub1n2)
        Rn = set_col(Rn, R_PROMO0_N, e.promo0_2)
        Rn = set_col(Rn, R_PROMO1_N, e.promo1_2)
        if NR2_0:
            Rn = set_col(Rn, R_HUGE0_N, e.huge0_2)
        if NR2_1:
            Rn = set_col(Rn, R_HUGE1_N, e.huge1_2)
        Rn = set_col(Rn, R_DONE, done2.astype(I32))
        Rn = set_col(Rn, R_OFLOW, get_col(e.R, R_OFLOW) | of_bits)
        Rn = Rn + e.counts_add
        b.regsi[:, :] = Rn

        return jnp.sum((~done2).astype(I32)) > 0

    def event_body(carry):
        step, _alive = carry
        E = [SimpleNamespace() for _ in range(SB)]
        for b, e in zip(B, E):
            ph_regs(b, e)
        for b, e in zip(B, E):
            ph_refill(b, e)
        for b, e in zip(B, E):
            ph_cur_start(b, e)
        for b, e in zip(B, E):
            ph_evsym(b, e)
        ph_lit_all(E)
        for b, e in zip(B, E):
            ph_lit_tail(b, e)
        for b, e in zip(B, E):
            ph_spans_pair(b, e)
        for b, e in zip(B, E):
            ph_wait_c0(b, e)
        for b, e in zip(B, E):
            ph_payload(b, e)
        if "dbgdump" in ablate:
            # lockstep-inspection dump (hw-vs-interpret bisect ONLY, see
            # kernel.py's dbgdump): clobber the ch model with this
            # event's decode internals; streams/outputs become garbage.
            for b, e in zip(B, E):
                dump = jnp.concatenate(
                    [
                        e.esym, e.length_new, e.slot_hit, e.rankd,
                        e.cid0, e.hit.astype(I32), e.is_new.astype(I32),
                        e.eof.astype(I32), get_col(e.R, R_OPOS),
                        get_col(e.R, R_NBITS),
                        e.st["low"].astype(I32), e.st["high"].astype(I32),
                        e.st["buf"].astype(I32),
                        e.frag32[:, :32],
                    ],
                    axis=1,
                )
                b.ch[:, :] = jnp.concatenate(
                    [dump, jnp.zeros((L, 256 - dump.shape[1]), I32)], 1
                )
        for b, e in zip(B, E):
            ph_dict(b, e)
        for b, e in zip(B, E):
            ph_ctx(b, e)
        for b, e in zip(B, E):
            ph_emit(b, e)
        for b, e in zip(B, E):
            ph_wb_start(b, e)
        for b, e in zip(B, E):
            ph_wb_wait(b, e)
        alive = jnp.bool_(False)
        for b, e in zip(B, E):
            alive = alive | ph_advance(b, e)
        return step + 1, alive

    def cond(carry):
        step, alive = carry
        return (step < nsteps) & alive

    jax.lax.while_loop(cond, event_body, (jnp.int32(0), jnp.bool_(True)))


def build_decoder_call(vc: VMCaps, params: X3Params, nsteps: int, G: int,
                       srows: int, obrows: int, SB: int = 1,
                       ablate: frozenset = frozenset()):
    """Construct the jitted pallas_call for (vc, params, nsteps, G, SB).

    Call signature: ``call(srcs, *states, interpret=False)`` with ``srcs``
    a tuple of SB per-sub-batch source arrays and ``states`` the flat
    concatenation of SB 20-tuples (see kernel.py build_encoder_call)."""
    D = vc.dict_cap
    G8 = G * L
    W2 = 2 * FW

    kern = functools.partial(
        decoder_kernel, vc=vc, params=params, nsteps=nsteps,
        srows=srows, obrows=obrows, SB=SB, ablate=ablate,
    )

    def vspec(width):
        return pl.BlockSpec((L, width), lambda g: (g, 0),
                            memory_space=pltpu.VMEM)

    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    carried_widths = [
        8 * D, D, D, D, D, vc.hub0, vc.hub0, vc.hub1, vc.hub1, vc.hub1,
        128, 128, 256, 128, 128, W2, OBW,
    ]
    state_specs = [vspec(w) for w in carried_widths] + [anyspec] * 3
    in_specs = [anyspec] * SB + state_specs * SB
    out_specs = state_specs * SB

    def sub_shapes():
        out = []
        for i, w in enumerate(carried_widths):
            dt = jnp.float32 if i == 14 else jnp.int32
            out.append(jax.ShapeDtypeStruct((G8, w), dt))
        out.append(jax.ShapeDtypeStruct((G8 * obrows, 128), jnp.int32))
        out.append(jax.ShapeDtypeStruct((G8 * vc.r0, 128), jnp.int32))
        out.append(jax.ShapeDtypeStruct((G8 * vc.r1, 128), jnp.int32))
        return out

    out_shape = sub_shapes() * SB

    sub_scratch = [
        pltpu.VMEM((L, FWROWS, 128), I32),      # sseg
        pltpu.VMEM((L, 1, 128), I32),           # c0in
        pltpu.VMEM((L, PB, 128), I32),          # c0big
        pltpu.VMEM((L, 1, 128), I32),           # c1pin
        pltpu.VMEM((L, PB, 128), I32),          # c1pbig
        pltpu.VMEM((L, 1, 128), I32),           # c1cin
        pltpu.VMEM((L, PB, 128), I32),          # c1cbig
        pltpu.VMEM((L, vc.pb2_0, 128), I32),    # c0hug (1-row dummy if off)
        pltpu.VMEM((L, vc.pb2_1, 128), I32),    # c1phug
        pltpu.VMEM((L, vc.pb2_1, 128), I32),    # c1chug
        pltpu.VMEM((L, OBROWS_F, 128), I32),    # stage
        pltpu.VMEM((L, 128), I32),              # frag_scr
        pltpu.VMEM((L, 128), I32),              # acw
        pltpu.VMEM((L, 128), jnp.float32),      # acwf
        pltpu.VMEM((L, 128), I32),              # xfer
        # fetch semaphores per lane, write-back/flush shared counters
        # (see kernel.py's scratch comment for the race analysis)
        pltpu.SemaphoreType.DMA((L,)),          # sem_src (refill)
        pltpu.SemaphoreType.DMA((L, 6)),        # sem_row (fetch slots)
        pltpu.SemaphoreType.DMA((6,)),          # sem_wb (shared counters)
        pltpu.SemaphoreType.DMA,                # sem_out (shared)
    ]
    scratch = sub_scratch * SB

    cp = vmem_compiler_params(
        SB * sum(L * w * 4 for w in carried_widths), scratch
    )

    def call(srcs, *state, interpret=False):
        assert len(srcs) == SB and len(state) == N_STATE_DEC * SB
        return pl.pallas_call(
            kern,
            grid=(G,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            input_output_aliases={SB + i: i for i in range(N_STATE_DEC * SB)},
            scratch_shapes=scratch,
            compiler_params=cp,
            interpret=interpret,
        )(*srcs, *state)

    return call
