"""The codec-VM encoder kernel: the whole x3 event loop in one Pallas
program.

One kernel launch runs up to ``nsteps`` events for every lane of a group.
A group is ``SB`` *sub-batches* of 8 lanes (SB in {1, 2, 4, 8}; groups are
sequential grid steps).  Every vector value stays [8, width] — the Mosaic
[L,1]->[L,D] lane-broadcast miscompile at L > 8 (CLAUDE.md) is sidestepped
by construction — and each sub-batch carries fully separate state arrays,
so the per-lane math is byte-identical at any SB.  The win is *latency*:
phases are emitted sub-batch-major (all sub-batches phase A, then all
phase B, ...), so the scalar core issues sub-batch k+1's row DMAs while
the VPU is still chewing sub-batch k's vector work, and the narrow
latency-bound AC chains of different sub-batches pipeline back-to-back.
Round 2 measured a ~25 us floor per 8-lane event-group (~10 us scalar DMA
issue + ~15 us compute, BENCH_NOTES.md); sub-batching attacks both terms
without touching the stream format.

Semantics are exactly the reference encoder's (x3.c:372-434) as already
modeled by x3tpu/codec.py:_enc_body; every section below cites the XLA
twin it must stay bit-identical to.

Per-event phases (DMA-overlapped, per sub-batch):
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
    FLUSH_WORDS, OF_CTX0, OF_CTX1, OF_DICT, OF_OUT, OF_PAIRS, PB,
    R_AC_HIGH, R_AC_LOW, R_AC_SCALE, R_C1, R_COUNTS, R_DICT_N, R_HUB0_N,
    R_HUB1_N, R_HUGE0_N, R_HUGE1_N, R_NBITS, R_OFLOW, R_P, R_PAIR_N,
    R_PREV_C1, R_PROMO0_N, R_PROMO1_N, R_SEG_BASE, R_TLEN, R_WIN_BASE,
    VMCaps,
)
from x3tpu.vm.prims import col_iota, get_col, set_col, vmem_compiler_params

I32 = jnp.int32
U32 = jnp.uint32
F32 = jnp.float32
from x3tpu.vm import config as _vmc
L = _vmc.LANES  # re-poked by set_active_lanes; never use bare LANES here
MML = MAX_MATCH_LEN

N_STATE = 19   # carried state arrays per sub-batch (16 VMEM + 3 HBM)
N_SCR = 24     # scratch refs per sub-batch (20 VMEM + 4 DMA semaphores)

# xfer scratch columns (vector -> scalar handoffs for DMA addressing)
XC_NEED, XC_ROW0, XC_RPREV, XC_RCUR, XC_BPREV, XC_BCUR = 0, 1, 2, 3, 4, 5
XC_RC0, XC_BC0 = 6, 7
XC_WB1R, XC_WB1B, XC_WB1S, XC_WB0R, XC_WB0B, XC_WB0S = 8, 9, 10, 11, 12, 13
XC_FLUSH, XC_FROW = 14, 15
# huge-tier columns (only written when the tier is compiled in)
XC_GPREV, XC_GCUR, XC_GC0 = 16, 17, 18
XC_WB1G, XC_WB1GS, XC_WB0G, XC_WB0GS = 19, 20, 21, 22
# gated-probe columns (only written when vc.probe_gate)
XC_VL, XC_BI = 23, 24
# acw scratch columns (AC state bridge across the literal while-loop)
AC_LOW, AC_HIGH, AC_SCALE, AC_NBITS, AC_OFLOW = 0, 1, 2, 3, 4


def _seg_rows(vc: VMCaps) -> int:
    return vc.wbuf // 128 + 6


def _pack_words(win):
    """win[:, :32] i32 bytes -> list of 8 LE-u32 words as [8,1] i32.

    Wide vector ops ONLY (one shift-by-position + 8 masked reduces): the
    obvious per-column form (win[:, o:o+1] | win[:, o+1:o+2] << 8 | ...)
    miscompiles on hardware at SB >= 2 — every produced word had its
    third byte (the << 16 term) zeroed, i.e. window column 4k+2 read as
    0 (hw_sb_inspect dump, round 3; the same signature as round 2's
    corrupted dictionary inserts).  Summing disjoint-bit-range terms is
    exactly OR."""
    iota = col_iota(MML)
    shifted = win[:, :MML] << ((iota & 3) * 8)
    return [
        jnp.sum(jnp.where((iota >> 2) == k, shifted, 0),
                axis=1, keepdims=True)
        for k in range(8)
    ]


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


def _probe_matchlen_2w(dictw, tw, D):
    """First tier of the gated probe: words 0-1 only.  Returns
    (mlen_p [8, D], run2 [8, D] bool) where ``mlen_p`` is the true match
    length capped at 8 (exact below 8; entries with ``run2`` alive have
    true mlen >= 8).  Exactness contract of the cap, relied on by every
    consumer when the gate does not fire (no entry with dlens > 8 is
    8-byte-alive):
      * ok = mlen >= dlens: for dlens <= 8 the cap preserves the
        comparison (alive -> both sides >= 8 >= dlens; dead -> exact);
        for dlens > 8 the entry is run2-dead, so mlen_p < 8 < dlens is
        exactly false.
      * dup = (dlens == m) & (mlen >= m): for m <= 8 as above; for
        m > 8 only dlens > 8 entries qualify and those are run2-dead."""
    run = jnp.ones((L, D), jnp.bool_)
    words = jnp.zeros((L, D), I32)
    xw_sel = jnp.zeros((L, D), I32)
    for w in range(2):
        sw = dictw[:, w * D : (w + 1) * D]
        eq = sw == tw[w]
        first_diff = run & ~eq
        xw_sel = jnp.where(first_diff, sw ^ tw[w], xw_sel)
        run = run & eq
        words = words + run.astype(I32)
    mlen_p = words * 4 + jnp.where(xw_sel != 0, _byte_refine(xw_sel), 0)
    return mlen_p, run


def _probe_select(dlens, d_n, mlen, D):
    """Selection half of the probe: (found, slot, dlen) from a match-length
    table (dict.c:105-130's longest-entry-wins, first-slot tie-break)."""
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
    return dlen > 0, slot, dlen


def _probe(dictw, dlens, d_n, tw, D):
    """Longest-prefix probe: (found, slot, dlen, matchlen[8,D])."""
    mlen = _probe_matchlen(dictw, tw, D)
    found, slot, dlen = _probe_select(dlens, d_n, mlen, D)
    return found, slot, dlen, mlen


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


STATE_NAMES = (
    "dictw", "dlens", "drank", "dtago", "ixf",
    "h0t", "h0f", "h1t", "h1f", "h1p", "ev", "ms", "ch",
    "regsi", "regsf", "sinkw", "outw", "c0r", "c1r",
)
SCR_NAMES = (
    "tseg", "seg32", "c0in", "c0big", "c1pin", "c1pbig", "c1cin", "c1cbig",
    "c0hug", "c1phug", "c1chug", "stage", "rem_scr", "xfer",
    "acw", "acwf", "winlo", "scan_scr", "mlen_scr", "wchk",
    "sem_seg", "sem_row", "sem_wb", "sem_out",
)


def encoder_kernel(
    *args,
    vc: VMCaps, params: X3Params, nsteps: int, trows: int, orows: int,
    SB: int = 1, ablate: frozenset = frozenset(),
):
    g = pl.program_id(0)
    D = vc.dict_cap
    WBUF = vc.wbuf
    SR = _seg_rows(vc)
    SRB = SR * 128
    S0, S1 = vc.s0, vc.s1
    R0, R1 = vc.r0, vc.r1
    SCAN = params.window - MML - 1
    SCANP = max((SCAN + 127) // 128 * 128, 128)
    CH = vc.scan_chunk  # chunked-scan width (0 = flat; see ph_probe_scan)
    # huge tier (statics; when a family's tier is off its hug scratch is a
    # 1-row dummy and the rows functions compile the 3-tier code exactly)
    NR2_0, NR2_1 = vc.nr2_0, vc.nr2_1
    PB2_0, PB2_1 = vc.pb2_0, vc.pb2_1
    HB0, HB1 = vc.hug0_base, vc.hug1_base
    # perf-ablation gates (hardware budget dissection ONLY -- any non-empty
    # ablate set produces WRONG output; see experiments/hw_vm_ablate.py)
    DO_DMA = "nodma" not in ablate
    # NB: the decoder's division staging (prims.ac_decode_value
    # stage hooks) is NOT applied on the encode side: a prophylactic
    # attempt broke the hardware-validated L=16 encoder (bench16
    # rc=136, corrupt streams, 2026-08-20) and was reverted — the
    # encoder's step feeds adjacent consumers in one expression group,
    # which has never miscompiled at L <= 16.
    ac_step = (lambda st, *a: st) if "noac" in ablate else prims.ac_encode

    # ---- unpack the per-sub-batch argument groups
    texts = args[:SB]
    ins = args[SB : SB + N_STATE * SB]
    outs = args[SB + N_STATE * SB : SB + 2 * N_STATE * SB]
    scr = args[SB + 2 * N_STATE * SB :]
    assert len(scr) == N_SCR * SB
    B = []
    for s in range(SB):
        b = SimpleNamespace()
        b.text32 = texts[s]
        for k, name in enumerate(STATE_NAMES):
            setattr(b, name + "_i", ins[s * N_STATE + k])
            setattr(b, name, outs[s * N_STATE + k])
        for k, name in enumerate(SCR_NAMES):
            setattr(b, name, scr[s * N_SCR + k])
        B.append(b)

    iota128 = col_iota(128)
    iotaD = col_iota(D)
    iota32c = col_iota(MML)

    def lane_rowbase(l, rper):
        # every sub-batch owns its own HBM arrays of G*L lanes
        return (g * L + l) * rper

    # ---- copy carried VMEM state into the (aliased) output blocks; all
    # further access goes through the out refs
    for b in B:
        for name in STATE_NAMES[:16]:  # the VMEM-carried arrays
            getattr(b, name)[:, :] = getattr(b, name + "_i")[:, :]
        # invalidate the (scratch) text segment at launch entry
        b.regsi[:, :] = set_col(
            b.regsi_i[:, :], R_SEG_BASE, jnp.full((L, 1), -(1 << 20), I32)
        )

    # ---- pre-loop: prime the prev-ctx1 row cache.  The event loop never
    # fetches the prev row from HBM: after a hit the (updated) cur row
    # scratch is swapped into the prev scratch — they are the same context
    # (x3.c:406: prev_context1 = context1) — and after a miss prev becomes
    # the hub.  Only the first event of a launch needs the HBM copy.
    if DO_DMA:
        for b in B:
            R0v = b.regsi[:, :]
            prev0 = get_col(R0v, R_PREV_C1)
            act0 = get_col(R0v, R_P) < get_col(R0v, R_TLEN)
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
    # per-event phase functions.  ``b`` is the sub-batch's refs; ``e`` its
    # per-event traced values.  Emission order in event_body is phase-major
    # across sub-batches so scalar DMA issue overlaps other sub-batches'
    # vector compute.
    # =======================================================================

    def ph_regs(b, e):
        """Read registers, decide refill, compute the cur-row index."""
        R = b.regsi[:, :]
        e.R = R
        e.p = get_col(R, R_P)
        e.tlen = get_col(R, R_TLEN)
        e.active = e.p < e.tlen

        # ---- A: text segment refill decision
        row0_old = get_col(R, R_SEG_BASE)
        off_cur = e.p - row0_old * 128
        e.need = e.active & ((off_cur < 0) | (off_cur + WBUF > SRB))
        e.row0 = jnp.where(e.need, e.p >> 7, row0_old)

        # ---- B: cur ctx1 row index (the prev row is never fetched
        # in-loop: c1pin/c1pbig hold it — primed before the loop, swapped
        # from the cur row after each hit)
        e.prev_c1 = get_col(R, R_PREV_C1)
        e.c1 = get_col(R, R_C1)
        e.rcur = jnp.where(e.active & (e.c1 >= 1), e.c1 - 1, -1)

        xf = b.xfer[:, :]
        xf = set_col(xf, XC_NEED, e.need.astype(I32))
        xf = set_col(xf, XC_ROW0, e.row0)
        # unconditional fetch, row clamped to 0: a stray read into the
        # scratch of a hub/inactive lane is masked out downstream, and an
        # ungated DMA is cheaper than a gated-out one (probe9)
        xf = set_col(xf, XC_RCUR, jnp.maximum(e.rcur, 0))
        b.xfer[:, :] = xf

    def ph_refill(b, e):
        """A: text segment refill (~1/100 events: ONE scalar gate around
        the whole phase — a gated-out per-lane DMA region still costs
        ~0.5 us, probe9)."""
        @pl.when(jnp.any(e.need))
        def _():
            for l in range(L):
                @pl.when(b.xfer[l, XC_NEED] != 0)
                def _(l=l):
                    r0 = lane_rowbase(l, trows) + b.xfer[l, XC_ROW0]
                    pltpu.make_async_copy(
                        b.text32.at[pl.ds(r0, SR), :], b.tseg.at[l],
                        b.sem_seg.at[l],
                    ).start()
            for l in range(L):
                @pl.when(b.xfer[l, XC_NEED] != 0)
                def _(l=l):
                    r0 = lane_rowbase(l, trows) + b.xfer[l, XC_ROW0]
                    pltpu.make_async_copy(
                        b.text32.at[pl.ds(r0, SR), :], b.tseg.at[l],
                        b.sem_seg.at[l],
                    ).wait()
            for r in range(SR):
                cols = slice(r * 128, (r + 1) * 128)
                b.seg32[:, cols] = jnp.where(
                    e.need, b.tseg[:, r, :], b.seg32[:, cols]
                )

    def ph_cur_start(b, e):
        """B: start the cur ctx1 row DMA (unconditional, clamped row)."""
        if DO_DMA:
            for l in range(L):
                r = lane_rowbase(l, R1) + b.xfer[l, XC_RCUR]
                pltpu.make_async_copy(
                    b.c1r.at[pl.ds(r, 1), :], b.c1cin.at[l],
                    b.sem_row.at[l, 0],
                ).start()

    def ph_window(b, e):
        """C: window extraction (segment barrel shift).

        The WHOLE window is MATERIALIZED into the ``winlo`` scratch and
        every consumer — probe words, scan, sweep vetoes, literal bytes,
        dict insert — reads that ref instead of a value derived from the
        barrel-shift chain.  On hardware at SB >= 2, Mosaic's
        rematerialization of such values across the phase-major schedule
        is WRONG: round 2 saw dict entries stored with zeroed byte
        columns (0x54222222 as 0x54002222); round 3's per-event dump
        (experiments/hw_sb_inspect.py) caught the packed probe words
        diverging from the (correct) materialized low bytes at the very
        first event.  A ref store is a hard materialization point, and
        re-reads of a within-event-stable ref are safe to replay."""
        off = e.p - e.row0 * 128
        x = b.seg32[:, :]
        for bit_i in range(10):
            bit = (off >> bit_i) & 1
            rolled = pltpu.roll(x, SRB - (1 << bit_i), axis=1)
            x = jnp.where(bit == 1, rolled, x)
        b.winlo[:, :] = x[:, :WBUF]
        e.win = b.winlo[:, :]

    def ph_probe_scan(b, e):
        """D: dictionary probe + window scan."""
        e.tw = _pack_words(e.win)
        e.d_n = get_col(e.R, R_DICT_N)
        e.dictw_v = b.dictw[:, :]
        e.dlens_v = b.dlens[:, :]
        if "noprobe" in ablate:
            e.found = jnp.zeros((L, 1), jnp.bool_)
            e.slot = jnp.zeros((L, 1), I32)
            e.dlen = jnp.zeros((L, 1), I32)
            e.probe_mlen = jnp.zeros((L, D), I32)
        elif vc.probe_gate:
            # tiered probe (round-3 verdict #3: the O(D) dense probe
            # dominates MB-block events): words 0-1 dense, words 2-7
            # only when some entry LONGER than 8 bytes is 8-byte-alive
            # — exactness argued at _probe_matchlen_2w.  The rare full
            # recompute stages through mlen_scr (a ref store is a hard
            # materialization point; the SB >= 2 remat hazard rule).
            mlen_p, run2 = _probe_matchlen_2w(e.dictw_v, e.tw, D)
            ext = run2 & (e.dlens_v > 8) & (iotaD < e.d_n)
            b.mlen_scr[:, :] = mlen_p

            @pl.when(jnp.any(ext))
            def _():
                # fresh ref reads only (winlo/dictw are within-event
                # stable; see ph_window's materialization note)
                tw2 = _pack_words(b.winlo[:, :])
                b.mlen_scr[:, :] = _probe_matchlen(b.dictw[:, :], tw2, D)

            e.probe_mlen = b.mlen_scr[:, :]
            e.found, e.slot, e.dlen = _probe_select(
                e.dlens_v, e.d_n, e.probe_mlen, D
            )
        else:
            e.found, e.slot, e.dlen, e.probe_mlen = _probe(
                e.dictw_v, e.dlens_v, e.d_n, e.tw, D
            )

        if SCAN > 0 and "noscan" not in ablate and CH:
            # Loop-over-chunks scan (vc.scan_chunk; round-5 queue #2):
            # identical run/counts semantics to the flat scan below, but
            # the window is walked in NCH chunks of CH offsets by a
            # fori_loop, so the PROGRAM is O(CH * MML) instead of
            # O(window * MML) — the flat scan's full unroll at 32 KiB
            # windows deterministically crashed the relay compile helper
            # (BENCH_NOTES r4c).  Offsets are independent across chunks
            # (each run bitmap restarts per chunk), so chunking is exact;
            # tail positions past SCAN are masked via `valid`.  The
            # chunk's window bytes come from ``wchk``, a rolling copy of
            # winlo left-rotated CH per iteration (one static-amount
            # roll; reads are static column slices — no dynamic lane
            # indexing, which Mosaic lacks).  Wrapped tail content is
            # only ever read at masked positions.  Counts ACCUMULATE
            # into rem_scr across chunks; the same 8-round group gating
            # as the flat scan applies per chunk (runs die fast, and a
            # dead chunk skips 3/4 of its compare work).
            GR = 8
            NCH = -(-SCAN // CH)
            iota_ch = col_iota(CH)
            b.wchk[:, :] = b.winlo[:, :]
            b.rem_scr[:, :] = jnp.zeros((L, 128), I32)

            def scan_chunk_body(k, carry):
                valid = (k * CH + iota_ch) < SCAN
                cs = b.wchk[:, :]
                win0 = b.winlo[:, :]
                run = valid
                cl = []
                for i in range(GR):
                    run = run & (
                        cs[:, 1 + i : 1 + i + CH] == win0[:, i : i + 1]
                    )
                    cl.append(jnp.sum(run.astype(I32), axis=1,
                                      keepdims=True))
                b.scan_scr[:, :] = run.astype(I32)
                seg0 = jnp.concatenate(
                    cl + [jnp.zeros((L, 128 - GR), I32)], axis=1
                )
                b.rem_scr[:, :] = b.rem_scr[:, :] + jnp.where(
                    iota128 < GR, seg0, 0
                )
                for gi in range(1, MML // GR):
                    @pl.when(jnp.sum(b.scan_scr[:, :]) > 0)
                    def _(gi=gi):
                        csg = b.wchk[:, :]     # fresh ref reads
                        wing = b.winlo[:, :]
                        rung = b.scan_scr[:, :] != 0
                        clg = []
                        for i in range(gi * GR, (gi + 1) * GR):
                            rung = rung & (
                                csg[:, 1 + i : 1 + i + CH]
                                == wing[:, i : i + 1]
                            )
                            clg.append(jnp.sum(rung.astype(I32), axis=1,
                                               keepdims=True))
                        b.scan_scr[:, :] = rung.astype(I32)
                        segg = jnp.concatenate(
                            [jnp.zeros((L, gi * GR), I32)] + clg
                            + [jnp.zeros((L, 128 - (gi + 1) * GR), I32)],
                            axis=1,
                        )
                        sel = (iota128 >= gi * GR) & (
                            iota128 < (gi + 1) * GR
                        )
                        b.rem_scr[:, :] = b.rem_scr[:, :] + jnp.where(
                            sel, segg, 0
                        )
                b.wchk[:, :] = pltpu.roll(b.wchk[:, :], WBUF - CH, axis=1)
                return carry

            jax.lax.fori_loop(0, NCH, scan_chunk_body, jnp.int32(0))
            e.counts = b.rem_scr[:, 0:MML]
        elif SCAN > 0 and "noscan" not in ablate:
            # The scan is the largest per-event term at the 8 KiB default
            # window (round-3 ablation: ~14 of ~32 us/event-group).  Two
            # structural choices against that:
            #
            # Rounds in GROUPS of 8: group 0 unconditional, groups 1-3
            # gated on the run being alive.  Once `run` dies every later
            # count is exactly 0, so the skip is EXACT.  Round 2 tried
            # PER-ROUND pl.when gating and reverted it (32 scalar syncs
            # ate the savings); 3 syncs per event flips the trade.  (An
            # accumulated-runlen + independent-threshold-sums variant
            # measured SLOWER — 0.59 vs 0.62 MB/s — the reduction chain
            # is not the bottleneck; reverted.)  Counts stage through
            # rem_scr (the sweep reads them before re-initializing it);
            # the live run bitmap stages through scan_scr.
            GR = 8
            iota_s = col_iota(SCANP)
            win = e.win
            run = (iota_s < SCAN) & (win[:, 1 : 1 + SCANP] == win[:, 0:1])
            counts_l = [jnp.sum(run.astype(I32), axis=1, keepdims=True)]
            for i in range(1, GR):
                run = run & (
                    win[:, 1 + i : 1 + i + SCANP] == win[:, i : i + 1]
                )
                counts_l.append(jnp.sum(run.astype(I32), axis=1,
                                        keepdims=True))
            b.scan_scr[:, :] = run.astype(I32)
            b.rem_scr[:, :] = jnp.concatenate(
                counts_l + [jnp.zeros((L, 128 - GR), I32)], axis=1
            )
            for g in range(1, MML // GR):
                @pl.when(jnp.sum(b.scan_scr[:, :]) > 0)
                def _(g=g):
                    wing = b.winlo[:, :]  # fresh ref read (see ph_window)
                    rung = b.scan_scr[:, :] != 0
                    cl = []
                    for i in range(g * GR, (g + 1) * GR):
                        rung = rung & (
                            wing[:, 1 + i : 1 + i + SCANP]
                            == wing[:, i : i + 1]
                        )
                        cl.append(jnp.sum(rung.astype(I32), axis=1,
                                          keepdims=True))
                    b.scan_scr[:, :] = rung.astype(I32)
                    seg = jnp.concatenate(
                        [jnp.zeros((L, g * GR), I32)] + cl
                        + [jnp.zeros((L, 128 - (g + 1) * GR), I32)],
                        axis=1,
                    )
                    sel = (iota128 >= g * GR) & (iota128 < (g + 1) * GR)
                    b.rem_scr[:, :] = jnp.where(sel, seg, b.rem_scr[:, :])
            e.counts = b.rem_scr[:, 0:MML]
        else:
            e.counts = jnp.zeros((L, MML), I32)

    def ph_spans_pair(b, e):
        """E: wait cur row; promoted-span DMAs; pair lookup; start ctx0
        row DMA."""
        if DO_DMA:
            for l in range(L):
                r = lane_rowbase(l, R1) + b.xfer[l, XC_RCUR]
                pltpu.make_async_copy(
                    b.c1r.at[pl.ds(r, 1), :], b.c1cin.at[l],
                    b.sem_row.at[l, 0],
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
        if DO_DMA:
            # promoted rows are rare (most blocks never promote): one
            # scalar gate for the whole big-span fetch
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
        if DO_DMA and NR2_1:
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
        # unconditional fetch (clamped row; stray reads masked downstream)
        b.xfer[:, :] = set_col(b.xfer[:, :], XC_RC0, jnp.maximum(e.rc0, 0))
        if DO_DMA:
            for l in range(L):
                r = lane_rowbase(l, R0) + b.xfer[l, XC_RC0]
                pltpu.make_async_copy(
                    b.c0r.at[pl.ds(r, 1), :], b.c0in.at[l],
                    b.sem_row.at[l, 2],
                ).start()

    def ph_sweep(b, e):
        """F: threshold sweep + magic-factor vetoes (backend.c:76-97),
        LOOP-FREE.

        The reference tries candidates in (threshold desc, i desc) order
        and codes the first that survives the magic-factor vetoes.  The
        veto conditions do not depend on the threshold, so a vetoed i is
        vetoed at every threshold — the result is exactly "argmax of
        key (level, i) over the NON-VETOED candidates".  The veto
        probes vl[o] (longest dict entry prefixing the window at offset
        o) are candidate-invariant, so ONE batch of MML-1 probes covers
        both factors: f1 vetoes i where vl[i]*f1 > i+1 (i >= 2), and
        f2's "exists o <= i with (vl[o]-o)*f2 > i+1" folds into a
        log-step prefix-max of vl[o]-o.  This replaces the round-2/3
        scalar-carried while_loop (>= one full veto-probe batch PLUS a
        vector->scalar sync per round) with pure pipelined vector work
        of the same single-round cost."""
        T = params.max_match_count
        f1, f2 = params.magic_factor1, params.magic_factor2
        if "nosweep" in ablate or T < 1:
            e.fbm = jnp.ones((L, 1), I32)
            return
        if "nof1" in ablate:
            f1 = 0
        if "nof2" in ablate:
            f2 = 0
        cand0 = e.counts >= 2
        level = jnp.minimum(e.counts - 1, T)
        ok = cand0
        if f2 == 0 and f1 > 0 and "sweepfast" not in ablate:
            # f1-only (the reference DEFAULT: -n 0): a while_loop paying
            # ONE probe per visited candidate beats the loop-free batch
            # of MML-1 probes (measured 0.62 vs 0.55 MB/s on the bench
            # config).  Loop state lives in rem_scr (counts were already
            # consumed above): cols [0,MML) remaining set, [64,64+MML)
            # level, col 127 result; every body input is a fresh ref
            # read (sweepsplit hardening, hardware-validated post
            # db35bb1).
            b.rem_scr[:, :] = (
                jnp.concatenate(
                    [cand0.astype(I32), jnp.zeros((L, 64 - MML), I32),
                     level, jnp.zeros((L, 128 - 64 - MML), I32)],
                    axis=1,
                )
                + jnp.where(
                    (iota128 == 127) & ~e.active, 1, jnp.zeros((L, 128), I32)
                )
            )

            def sweep_cond(c):
                it, unresolved = c
                return (it < MML) & unresolved

            def sweep_round(c):
                it, _ = c
                st = b.rem_scr[:, :]
                result = st[:, 127:128]
                level_f = st[:, 64 : 64 + MML]
                remaining = st[:, 0:MML] != 0
                unresolved = result == 0
                key = jnp.where(remaining, level_f * MML + iota32c, -1)
                has = jnp.any(remaining, axis=1, keepdims=True)
                kmx = jnp.max(key, axis=1, keepdims=True)
                bi = jnp.maximum(
                    jnp.max(jnp.where(key == kmx, iota32c, -1),
                            axis=1, keepdims=True),
                    0,
                )
                result = jnp.where(unresolved & ~has, 1, result)
                pending = unresolved & has
                wl = b.winlo[:, :]      # fresh ref reads
                if vc.probe_gate:
                    # tiered veto probe (see ph_probe_scan): dense
                    # words 0-1 decide dlens <= 8 exactly; longer
                    # entries need the gated full probe only when
                    # 8-byte-alive.  Result + candidate offset stage
                    # through xfer columns across the pl.when.
                    tw_b = _pack_words(_select32(wl, bi))
                    dls = b.dlens[:, :]
                    d_nv = get_col(b.regsi[:, :], R_DICT_N)
                    mlp, run2 = _probe_matchlen_2w(b.dictw[:, :], tw_b, D)
                    iota_d = col_iota(D)
                    ok_p = ((iota_d < d_nv) & (dls > 0) & (dls <= 8)
                            & (mlp >= dls))
                    vl_p = jnp.max(jnp.where(ok_p, dls, 0), axis=1,
                                   keepdims=True)
                    ext = run2 & (dls > 8) & (iota_d < d_nv)
                    b.xfer[:, :] = set_col(
                        set_col(b.xfer[:, :], XC_VL, vl_p), XC_BI, bi
                    )

                    @pl.when(jnp.any(ext))
                    def _():
                        bi2 = get_col(b.xfer[:, :], XC_BI)
                        tw2 = _pack_words(_select32(b.winlo[:, :], bi2))
                        vlf = _probe_best_len(
                            b.dictw[:, :], b.dlens[:, :],
                            get_col(b.regsi[:, :], R_DICT_N), tw2, D,
                        )
                        b.xfer[:, :] = set_col(b.xfer[:, :], XC_VL, vlf)

                    vl = get_col(b.xfer[:, :], XC_VL)
                else:
                    vl = _probe_best_len(
                        b.dictw[:, :], b.dlens[:, :],
                        get_col(b.regsi[:, :], R_DICT_N),
                        _pack_words(_select32(wl, bi)), D,
                    )
                vetoed = (
                    pending & (bi >= 2) & (vl > 0) & (vl * f1 > bi + 1)
                )
                result = jnp.where(pending & ~vetoed, bi + 1, result)
                clear = vetoed & (iota128 == bi)
                b.rem_scr[:, :] = jnp.where(
                    iota128 == 127, result, jnp.where(clear, 0, st)
                )
                return it + 1, jnp.sum((result == 0).astype(I32)) > 0

            jax.lax.while_loop(
                sweep_cond, sweep_round,
                (jnp.int32(0), jnp.sum(e.active.astype(I32)) > 0),
            )
            e.fbm = b.rem_scr[:, 127:128]
            return
        if (f1 > 0 or f2 > 0) and "sweepfast" not in ablate:
            wl = b.winlo[:, :]  # fresh ref read (see ph_window)
            vl_cols = [jnp.zeros((L, 1), I32)]  # o = 0 unused (o >= 1)
            for o in range(1, MML):
                vl_cols.append(_probe_best_len(
                    e.dictw_v, e.dlens_v, e.d_n,
                    _pack_words(wl[:, o : o + MML]), D,
                ))
            VL = jnp.concatenate(vl_cols, axis=1)  # [L, MML]
            veto = jnp.zeros((L, MML), jnp.bool_)
            if f1 > 0:
                veto = veto | (
                    (iota32c >= 2) & (VL > 0) & (VL * f1 > iota32c + 1)
                )
            if f2 > 0:
                # x[o] = vl[o] - o for o >= 1 (vl[o] = 0 gives a
                # negative value that can never veto, matching the
                # reference's vl > 0 requirement); pm[i] = max x[1..i]
                x = jnp.where(iota32c >= 1, VL - iota32c, -(1 << 20))
                pm = x
                sh = 1
                while sh < MML:
                    pm = jnp.maximum(pm, jnp.concatenate(
                        [jnp.full((L, sh), -(1 << 20), I32),
                         pm[:, : MML - sh]], axis=1))
                    sh *= 2
                veto = veto | ((iota32c >= 1) & (pm * f2 > iota32c + 1))
            ok = ok & ~veto
        key = jnp.where(ok, level * MML + iota32c, -1)
        has = jnp.any(ok, axis=1, keepdims=True)
        kmax = jnp.max(key, axis=1, keepdims=True)
        best_i = jnp.max(
            jnp.where(key == kmax, iota32c, -1), axis=1, keepdims=True
        )
        e.fbm = jnp.where(has, best_i + 1, 1)

    def ph_wait_c0(b, e):
        """Wait the ctx0 row DMA; fetch its promoted span if any."""
        if DO_DMA:
            for l in range(L):
                r = lane_rowbase(l, R0) + b.xfer[l, XC_RC0]
                pltpu.make_async_copy(
                    b.c0r.at[pl.ds(r, 1), :], b.c0in.at[l],
                    b.sem_row.at[l, 2],
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
        if DO_DMA:
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
        if DO_DMA and NR2_0:
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

    def ph_mode(b, e):
        """G: mode stats + selection (x3.c:150-172) + decision
        (x3.c:381-404)."""
        hub0n = get_col(e.R, R_HUB0_N)
        e.v0 = rw.row_view(rw.FAM0, e.cid0, b.c0in, b.c0big, hub0n, e.active,
                           hug_scr=b.c0hug if NR2_0 else None, m=vc.m0)
        e.f0, e.pos0, _ = rw.row_find(
            rw.FAM0, e.v0, e.slot, b.c0in, b.c0big, b.h0t[:, :],
            b.h0f[:, :], None,
            hug_scr=b.c0hug if NR2_0 else None, nr2=NR2_0,
        )
        low0, span0, tot0 = rw.row_stats(
            rw.FAM0, e.v0, e.pos0, b.c0in, b.c0big, b.h0f[:, :],
            hug_scr=b.c0hug if NR2_0 else None, nr2=NR2_0,
        )
        e.v_cur = rw.row_view(rw.FAM1, e.c1, b.c1cin, b.c1cbig, e.hub1n,
                              e.active,
                              hug_scr=b.c1chug if NR2_1 else None, m=vc.m1)
        e.f1c, e.pos1, _ = rw.row_find(
            rw.FAM1, e.v_cur, e.slot, b.c1cin, b.c1cbig, b.h1t[:, :],
            b.h1f[:, :], b.h1p[:, :],
            hug_scr=b.c1chug if NR2_1 else None, nr2=NR2_1,
        )
        low1, span1, tot1 = rw.row_stats(
            rw.FAM1, e.v_cur, e.pos1, b.c1cin, b.c1cbig, b.h1f[:, :],
            hug_scr=b.c1chug if NR2_1 else None, nr2=NR2_1,
        )

        e.rank = jnp.sum(jnp.where(iotaD == e.slot, b.drank[:, :], 0),
                         axis=1, keepdims=True)
        # ixf holds the index model as an INCLUSIVE cumulative-frequency
        # row (C[j] = sum of freqs 0..j; trailing slots past d_n carry
        # the total).  low/span/total become two masked reads + a static
        # tail slice instead of three O(D) reductions, and the decoder's
        # interval search drops its log2(D) cumsum entirely
        # (prims.model_decode_cum) — the round-3 verdict #5 decode
        # inversion at D = 24576 was exactly that cumsum.
        ixv = b.ixf[:, :]
        e.ixlow = jnp.sum(jnp.where(iotaD == e.rank - 1, ixv, 0), axis=1,
                          keepdims=True)
        cr = jnp.sum(jnp.where(iotaD == e.rank, ixv, 0), axis=1,
                     keepdims=True)
        e.ixspan = cr - e.ixlow
        e.ixtot = ixv[:, D - 1 : D]

        evv = b.ev[:, :]
        e.evv = evv
        e.etot = jnp.sum(evv, axis=1, keepdims=True)
        p_ev0 = _fprob(get_col(evv, E_CTX0), e.etot)
        p_ev1 = _fprob(get_col(evv, E_CTX1), e.etot)
        p_ev2 = _fprob(get_col(evv, E_IDX1), e.etot)
        zero = jnp.float32(0)
        prob0 = jnp.where(e.f0, p_ev0 * _fprob(span0, tot0), zero)
        prob1 = jnp.where(e.f1c, p_ev1 * _fprob(span1, tot1), zero)
        probx = p_ev2 * _fprob(e.ixspan, e.ixtot)
        mode = jnp.full((L, 1), E_IDX1, I32)
        best = probx
        take0 = prob0 > best
        mode = jnp.where(take0, E_CTX0, mode)
        best = jnp.where(take0, prob0, best)
        take1 = prob1 > best
        mode = jnp.where(take1, E_CTX1, mode)
        e.best = jnp.where(take1, prob1, best)
        e.mode = mode
        e.low0, e.span0, e.tot0 = low0, span0, tot0
        e.low1, e.span1, e.tot1 = low1, span1, tot1

        # decision (x3.c:381-404)
        if params.nl_remap:
            nl = jnp.where(
                e.dlen == 1, 1,
                jnp.where(e.dlen == 2, 4,
                          jnp.where(e.dlen == 3, 6,
                                    jnp.where(e.dlen == 4, 8, 9999))),
            )
            nl = jnp.where(e.dlen == 0, 0, nl)
        else:
            nl = e.dlen
        e.hit = e.active & e.found & (nl >= e.fbm) & (e.p + e.dlen <= e.tlen)
        e.miss = e.active & ~e.hit
        e.mlen = jnp.clip(jnp.minimum(e.fbm, e.tlen - e.p), 1, MML)
        e.dup = jnp.any(
            (iotaD < e.d_n) & (e.dlens_v == e.mlen)
            & (e.probe_mlen >= e.mlen),
            axis=1, keepdims=True,
        )

    def ph_ac_head(b, e):
        """H: event symbol + payload symbol; bridge AC state into scratch
        for the merged literal loop."""
        acst = dict(
            low=get_col(e.R, R_AC_LOW).astype(U32),
            high=get_col(e.R, R_AC_HIGH).astype(U32),
            scale=get_col(e.R, R_AC_SCALE),
            nbits=get_col(e.R, R_NBITS),
            win_base=get_col(e.R, R_WIN_BASE),
            win=b.sinkw[:, :],
            oflow=jnp.zeros((L, 1), jnp.bool_),
        )
        e.esym = jnp.where(e.hit, e.mode, E_NEW)
        elow, espan, _et = _model_stats(e.evv, e.esym, 128)
        acst = ac_step(acst, elow, espan, e.etot, e.active)
        b.ev[:, :] = e.evv + jnp.where((iota128 == e.esym) & e.active, 1, 0)
        e.espan = espan

        # payload symbol (x3.c:179-190 / 257-261)
        msv = b.ms[:, :]
        mslow, msspan, mstot = _model_stats(msv, e.mlen - 1, 128)
        is0 = e.hit & (e.mode == E_CTX0)
        is1 = e.hit & (e.mode == E_CTX1)
        isx = e.hit & (e.mode == E_IDX1)
        plow = jnp.where(is0, e.low0, jnp.where(is1, e.low1,
                jnp.where(isx, e.ixlow, mslow)))
        pspan = jnp.where(is0, e.span0, jnp.where(is1, e.span1,
                 jnp.where(isx, e.ixspan, msspan)))
        ptot = jnp.where(is0, e.tot0, jnp.where(is1, e.tot1,
                jnp.where(isx, e.ixtot, mstot)))
        acst = ac_step(acst, plow, pspan, ptot, e.active)
        # cumulative ixf: freq[rank] += 1 is +1 on every column >= rank
        b.ixf[:, :] = b.ixf[:, :] + jnp.where((iotaD >= e.rank) & isx, 1, 0)
        b.ms[:, :] = msv + jnp.where((iota128 == e.mlen - 1) & e.miss, 1, 0)
        e.msspan, e.mstot = msspan, mstot

        # literal bytes (x3.c:263-267): AC state bridged through scratch
        e.frag32 = b.winlo[:, :MML]  # fresh ref read (see ph_window)
        b.acw[:, :] = set_col(
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
        b.sinkw[:, :] = acst["win"]
        b.acwf[:, :] = jnp.zeros((L, 128), F32)
        e.win_base = acst["win_base"]
        e.kmax = (jnp.int32(0) if "nolit" in ablate
                  else jnp.max(jnp.where(e.miss, e.mlen, 0)))

    def ph_lit_all(E):
        """Merged literal loop: ONE early-exit scalar while over the max
        fragment length of ALL sub-batches (most events are dictionary
        hits with zero literal bytes); each round codes one byte per
        active missing lane of every sub-batch."""
        kmax = E[0].kmax
        for e in E[1:]:
            kmax = jnp.maximum(kmax, e.kmax)

        def lit_step(k):
            for b, e in zip(B, E):
                a2 = b.acw[:, :]
                st2 = dict(
                    low=get_col(a2, AC_LOW).astype(U32),
                    high=get_col(a2, AC_HIGH).astype(U32),
                    scale=get_col(a2, AC_SCALE),
                    nbits=get_col(a2, AC_NBITS),
                    win_base=e.win_base,
                    win=b.sinkw[:, :],
                    oflow=get_col(a2, AC_OFLOW) != 0,
                )
                act = e.miss & (k < e.mlen)
                byte = jnp.sum(
                    jnp.where(iota32c == k, e.frag32, 0), axis=1,
                    keepdims=True,
                )
                chv = b.ch[:, :]
                i256 = col_iota(256)
                blow = jnp.sum(jnp.where(i256 < byte, chv, 0), axis=1,
                               keepdims=True)
                bspan = jnp.sum(jnp.where(i256 == byte, chv, 0), axis=1,
                                keepdims=True)
                btot = jnp.sum(chv, axis=1, keepdims=True)
                st2 = ac_step(st2, blow, bspan, btot, act)
                b.ch[:, :] = chv + jnp.where((i256 == byte) & act, 1, 0)
                b.acwf[:, :] = b.acwf[:, :] + jnp.where(
                    (col_iota(128) == 0) & act,
                    prims.bits_f32(bspan, btot), 0.0,
                )
                b.acw[:, :] = set_col(
                    set_col(
                        set_col(
                            set_col(
                                set_col(b.acw[:, :], AC_LOW,
                                        st2["low"].astype(I32)),
                                AC_HIGH, st2["high"].astype(I32)),
                            AC_SCALE, st2["scale"]),
                        AC_NBITS, st2["nbits"]),
                    AC_OFLOW, st2["oflow"].astype(I32),
                )
                b.sinkw[:, :] = st2["win"]
            return k + 1

        jax.lax.while_loop(lambda k: k < kmax, lit_step, jnp.int32(0))

    def ph_ac_tail(b, e):
        """Collect the post-literal AC state + the stats bits
        (x3.c:192-193, 253-264)."""
        a2 = b.acw[:, :]
        e.acst = dict(
            low=get_col(a2, AC_LOW).astype(U32),
            high=get_col(a2, AC_HIGH).astype(U32),
            scale=get_col(a2, AC_SCALE),
            nbits=get_col(a2, AC_NBITS),
            win_base=e.win_base,
            win=b.sinkw[:, :],
            oflow=get_col(a2, AC_OFLOW) != 0,
        )
        lit_bits = b.acwf[:, 0:1]
        ev_bits = prims.bits_f32(e.espan, e.etot)
        ms_bits = prims.bits_f32(e.msspan, e.mstot)
        hit_bits = -jnp.log2(jnp.maximum(e.best, jnp.float32(1e-38)))
        add_bits = jnp.where(
            e.hit, hit_bits,
            jnp.where(e.miss, ev_bits + ms_bits + lit_bits, 0.0),
        )
        b.regsf[:, :] = b.regsf[:, :] + jnp.where(
            iota128 == e.esym, add_bits, 0.0
        )

    def ph_dict(b, e):
        """I: dictionary MTF / insert (dict.c:132, x3.c:411-420)."""
        drank_v = b.drank[:, :]
        dtago_v = b.dtago[:, :]
        validD = iotaD < e.d_n
        # MTF of the hit tag
        bump = validD & e.hit & (drank_v < e.rank)
        drank_v = jnp.where(bump, drank_v + 1, drank_v)
        drank_v = jnp.where((iotaD == e.slot) & e.hit, 0, drank_v)
        shifted = pltpu.roll(dtago_v, 1, axis=1)
        dtago_v = jnp.where(e.hit & (iotaD <= e.rank), shifted, dtago_v)
        dtago_v = jnp.where(e.hit & (iotaD == 0), e.slot, dtago_v)
        # insert on miss unless duplicate
        room = e.d_n < D
        ins = e.miss & ~e.dup & room
        e.of_dict = e.miss & ~e.dup & ~room
        slot_new = jnp.minimum(e.d_n, D - 1)

        tw_ins = _pack_words(b.winlo[:, :])  # fresh ref read (ph_window)

        @pl.when(jnp.any(ins))
        def _():
            for w in range(8):
                cols = slice(w * D, (w + 1) * D)
                b.dictw[:, cols] = jnp.where(
                    ins & (iotaD == slot_new), tw_ins[w], b.dictw[:, cols]
                )

        b.dlens[:, :] = jnp.where(ins & (iotaD == slot_new), e.mlen,
                                  e.dlens_v)
        drank_v = jnp.where(ins & validD, drank_v + 1, drank_v)
        drank_v = jnp.where(ins & (iotaD == slot_new), 0, drank_v)
        shifted2 = pltpu.roll(dtago_v, 1, axis=1)
        dtago_v = jnp.where(ins & (iotaD > 0), shifted2, dtago_v)
        dtago_v = jnp.where(ins & (iotaD == 0), slot_new, dtago_v)
        b.drank[:, :] = drank_v
        b.dtago[:, :] = dtago_v
        # cumulative ixf: appending a freq-1 entry at slot_new adds 1 to
        # every column >= slot_new (tail invariant C[j >= d_n] = total)
        b.ixf[:, :] = b.ixf[:, :] + jnp.where(ins & (iotaD >= slot_new),
                                              1, 0)
        e.d_n2 = e.d_n + jnp.where(ins, 1, 0)

    def ph_ctx(b, e):
        """J: context updates + pair registration (x3.c:195-222)."""
        pair_n = get_col(e.R, R_PAIR_N)
        promo0 = get_col(e.R, R_PROMO0_N)
        promo1 = get_col(e.R, R_PROMO1_N)
        huge0 = get_col(e.R, R_HUGE0_N)
        huge1 = get_col(e.R, R_HUGE1_N)
        (e.hub0n2, e.promo0_2, dp0, e.span0_idx, of0, e.huge0_2, dg0,
         e.gid0) = rw.row_update(
            rw.FAM0, e.v0, e.slot, e.f0, e.pos0, e.hit, b.c0in, b.c0big,
            b.h0t, b.h0f, None, get_col(e.R, R_HUB0_N), vc.hub0, promo0,
            vc.m0,
            hug_scr=b.c0hug if NR2_0 else None, nr2=NR2_0, m=vc.m0,
            huge_n=huge0, huge_cap=vc.h2_0, big_trig=vc.big_trig0,
        )
        (e.hub1n2, e.promo1_2, dp1, e.span1_idx, of1, e.huge1_2, dg1,
         e.gid1) = rw.row_update(
            rw.FAM1, e.v_cur, e.slot, e.f1c, e.pos1, e.hit, b.c1cin,
            b.c1cbig, b.h1t, b.h1f, b.h1p, e.hub1n, vc.hub1, promo1, vc.m1,
            # clamp the registered id: past the pairs capacity the
            # lane is OF_PAIRS-flagged (host discards + retries), but
            # an unclamped stored id would later address ctx0 rows
            # beyond the lane's region (cid0-1 feeds the row DMAs)
            new_pair_id=jnp.minimum(pair_n, S0 - 1),
            hug_scr=b.c1chug if NR2_1 else None, nr2=NR2_1, m=vc.m1,
            huge_n=huge1, huge_cap=vc.h2_1, big_trig=vc.big_trig1,
        )
        new_pair = e.hit & ~e.f1c
        e.of_pairs = new_pair & (pair_n >= S0)
        e.pair_n2 = pair_n + jnp.where(new_pair, 1, 0)
        e.of0, e.of1 = of0, of1
        e.dp0, e.dp1, e.dg0, e.dg1 = dp0, dp1, dg0, dg1

    def ph_wb_start(b, e):
        """K: write-back DMA starts."""
        wb0 = e.hit & (e.cid0 >= 1)
        e.wb0b = wb0 & (e.v0.is_big | e.dp0)
        wb1 = e.hit & (e.c1 >= 1)
        e.wb1b = wb1 & (e.v_cur.is_big | e.dp1)
        e.wb0g = wb0 & (e.v0.is_huge | e.dg0) if NR2_0 else None
        e.wb1g = wb1 & (e.v_cur.is_huge | e.dg1) if NR2_1 else None
        # unconditional write-backs: a non-hit lane's row scratch is
        # unmodified (row_update masks by hit), so writing it back is a
        # no-op byte-wise; lanes that fetched nothing target the per-lane
        # dump row (vc.dump0/dump1)
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
        if DO_DMA:
            for l in range(L):
                r = lane_rowbase(l, R0) + b.xfer[l, XC_WB0R]
                pltpu.make_async_copy(
                    b.c0in.at[l], b.c0r.at[pl.ds(r, 1), :], b.sem_wb.at[0]
                ).start()
                r1w = lane_rowbase(l, R1) + b.xfer[l, XC_WB1R]
                pltpu.make_async_copy(
                    b.c1cin.at[l], b.c1r.at[pl.ds(r1w, 1), :],
                    b.sem_wb.at[2],
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

    def ph_flush(b, e):
        """K: sink flush — move a full FLUSH_WORDS half out to HBM.
        Bounded to the lane's orows region (past the output capacity the
        lane is already OF_OUT-flagged; an unbounded flush row would DMA
        into the NEXT lane's output)."""
        win_base = e.acst["win_base"]
        widx_now = (e.acst["nbits"] >> 5) - win_base
        flush = (widx_now >= FLUSH_WORDS) & (
            (win_base >> 7) + 2 <= orows
        )
        e.flush = flush
        b.xfer[:, :] = set_col(
            set_col(b.xfer[:, :], XC_FLUSH, flush.astype(I32)),
            XC_FROW, win_base >> 7,
        )

        @pl.when(jnp.any(flush))
        def _():
            b.stage[:, 0, :] = b.sinkw[:, 0:128]
            b.stage[:, 1, :] = b.sinkw[:, 128:256]
            for l in range(L):
                @pl.when(b.xfer[l, XC_FLUSH] != 0)
                def _(l=l):
                    r = lane_rowbase(l, orows) + b.xfer[l, XC_FROW]
                    pltpu.make_async_copy(
                        b.stage.at[l], b.outw.at[pl.ds(r, 2), :],
                        b.sem_out,
                    ).start()
            for l in range(L):
                @pl.when(b.xfer[l, XC_FLUSH] != 0)
                def _(l=l):
                    r = lane_rowbase(l, orows) + b.xfer[l, XC_FROW]
                    pltpu.make_async_copy(
                        b.stage.at[l], b.outw.at[pl.ds(r, 2), :],
                        b.sem_out,
                    ).wait()

        shifted_win = jnp.concatenate(
            [e.acst["win"][:, FLUSH_WORDS:],
             jnp.zeros((L, FLUSH_WORDS), I32)],
            axis=1,
        )
        b.sinkw[:, :] = jnp.where(flush, shifted_win, e.acst["win"])
        e.win_base2 = win_base + jnp.where(flush, FLUSH_WORDS, 0)

    def ph_wb_wait(b, e):
        """K: wait row write-backs before the next event's reads."""
        if DO_DMA:
            for l in range(L):
                r = lane_rowbase(l, R0) + b.xfer[l, XC_WB0R]
                pltpu.make_async_copy(
                    b.c0in.at[l], b.c0r.at[pl.ds(r, 1), :], b.sem_wb.at[0]
                ).wait()
                r1w = lane_rowbase(l, R1) + b.xfer[l, XC_WB1R]
                pltpu.make_async_copy(
                    b.c1cin.at[l], b.c1r.at[pl.ds(r1w, 1), :],
                    b.sem_wb.at[2],
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
        """K: prev-row cache swap + register advance.  Returns the
        sub-batch's alive flag."""
        # prev-row cache swap (x3.c:406 prev_context1 = context1): lanes
        # that hit carry the UPDATED cur row as next event's prev row; a
        # miss resets prev to the hub, so c1pin content is then unread
        b.c1pin[:, 0, :] = jnp.where(
            e.hit & (e.c1 >= 1), b.c1cin[:, 0, :], b.c1pin[:, 0, :]
        )

        @pl.when(jnp.any(e.wb1b))
        def _():
            for r in range(PB):
                b.c1pbig[:, r, :] = jnp.where(
                    e.wb1b, b.c1cbig[:, r, :], b.c1pbig[:, r, :]
                )

        if NR2_1:
            # a hit on a huge (or just-promoted) cur row carries its huge
            # span into the prev cache, like the big swap above
            @pl.when(jnp.any(e.wb1g))
            def _():
                for r in range(PB2_1):
                    b.c1phug[:, r, :] = jnp.where(
                        e.wb1g, b.c1chug[:, r, :], b.c1phug[:, r, :]
                    )

        # advance (x3.c:397-428 mirror of codec.py step 9)
        p2 = e.p + jnp.where(e.hit, e.dlen, jnp.where(e.miss, e.mlen, 0))
        prev2 = jnp.where(e.hit, e.c1, jnp.where(e.miss, 0, e.prev_c1))
        c1_2 = jnp.where(e.hit, e.slot, jnp.where(e.miss, 0, e.c1))

        of_out = e.acst["oflow"] | (
            e.acst["nbits"] > vc.out_words * 32 - 32 * FLUSH_WORDS
        )
        of_bits = (
            jnp.where(e.of_dict, OF_DICT, 0)
            | jnp.where(e.of0, OF_CTX0, 0)
            | jnp.where(e.of1, OF_CTX1, 0)
            | jnp.where(e.of_pairs, OF_PAIRS, 0)
            | jnp.where(of_out, OF_OUT, 0)
        )

        Rn = e.R
        Rn = set_col(Rn, R_P, p2)
        Rn = set_col(Rn, R_PREV_C1, prev2)
        Rn = set_col(Rn, R_C1, c1_2)
        Rn = set_col(Rn, R_PAIR_N, e.pair_n2)
        Rn = set_col(Rn, R_DICT_N, e.d_n2)
        Rn = set_col(Rn, R_AC_LOW, e.acst["low"].astype(I32))
        Rn = set_col(Rn, R_AC_HIGH, e.acst["high"].astype(I32))
        Rn = set_col(Rn, R_AC_SCALE, e.acst["scale"])
        Rn = set_col(Rn, R_NBITS, e.acst["nbits"])
        Rn = set_col(Rn, R_WIN_BASE, e.win_base2)
        Rn = set_col(Rn, R_SEG_BASE, e.row0)
        Rn = set_col(Rn, R_HUB0_N, e.hub0n2)
        Rn = set_col(Rn, R_HUB1_N, e.hub1n2)
        Rn = set_col(Rn, R_PROMO0_N, e.promo0_2)
        Rn = set_col(Rn, R_PROMO1_N, e.promo1_2)
        if NR2_0:
            Rn = set_col(Rn, R_HUGE0_N, e.huge0_2)
        if NR2_1:
            Rn = set_col(Rn, R_HUGE1_N, e.huge1_2)
        Rn = set_col(Rn, R_OFLOW, get_col(e.R, R_OFLOW) | of_bits)
        # event counters (x3.c:42): counts[esym] += 1
        Rn = Rn + jnp.where(
            (iota128 == R_COUNTS + e.esym) & e.active, 1, 0
        )
        b.regsi[:, :] = Rn

        return jnp.sum((p2 < e.tlen).astype(I32)) > 0

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
            ph_window(b, e)
        for b, e in zip(B, E):
            ph_probe_scan(b, e)
        for b, e in zip(B, E):
            ph_spans_pair(b, e)
        for b, e in zip(B, E):
            ph_sweep(b, e)
        for b, e in zip(B, E):
            ph_wait_c0(b, e)
        for b, e in zip(B, E):
            ph_mode(b, e)
        if "dbgdump" in ablate:
            # lockstep-inspection dump (hw-vs-interpret bisect ONLY):
            # clobber the ch model array with this event's phase-D/F/G
            # internals so the capture harness can diff the first
            # diverging signal.  Both sides clobber identically; streams
            # are garbage, which the ablate contract already states.
            for b, e in zip(B, E):
                dump = jnp.concatenate(
                    [
                        e.counts,                       # 0..MML
                        e.fbm,                          # MML
                        e.found.astype(I32), e.slot, e.dlen,
                        e.hit.astype(I32), e.miss.astype(I32),
                        e.mode, e.mlen, e.p, e.d_n,     # ..MML+10
                        *e.tw,                          # MML+10..MML+18
                        b.winlo[:, :64],
                    ],
                    axis=1,
                )
                b.ch[:, :] = jnp.concatenate(
                    [dump, jnp.zeros((L, 256 - dump.shape[1]), I32)], 1
                )
        for b, e in zip(B, E):
            ph_ac_head(b, e)
        ph_lit_all(E)
        for b, e in zip(B, E):
            ph_ac_tail(b, e)
        for b, e in zip(B, E):
            ph_dict(b, e)
        for b, e in zip(B, E):
            ph_ctx(b, e)
        for b, e in zip(B, E):
            ph_wb_start(b, e)
        for b, e in zip(B, E):
            ph_flush(b, e)
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


def build_encoder_call(vc: VMCaps, params: X3Params, nsteps: int, G: int,
                       ablate: frozenset = frozenset(), SB: int = 1):
    """Construct the jitted pallas_call for (vc, params, nsteps, G, SB).

    The call signature is ``call(texts, *states, interpret=False)`` where
    ``texts`` is a tuple of SB per-sub-batch text arrays and ``states`` is
    the flat concatenation of SB 19-tuples of per-sub-batch state arrays
    (each sized for G*LANES lanes)."""
    D = vc.dict_cap
    SR = _seg_rows(vc)
    G8 = G * L
    trows = vc.text_bytes // 128
    orows = vc.out_words // 128
    SCAN_ = params.window - MML - 1
    SCANP_ = max((SCAN_ + 127) // 128 * 128, 128)  # scan_scr width

    kern = functools.partial(
        encoder_kernel, vc=vc, params=params, nsteps=nsteps,
        trows=trows, orows=orows, SB=SB, ablate=ablate,
    )

    def vspec(width):
        return pl.BlockSpec((L, width), lambda g: (g, 0),
                            memory_space=pltpu.VMEM)

    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    carried_widths = [
        8 * D, D, D, D, D, vc.hub0, vc.hub0, vc.hub1, vc.hub1, vc.hub1,
        128, 128, 256, 128, 128, 2 * FLUSH_WORDS,
    ]
    state_specs = [vspec(w) for w in carried_widths] + [anyspec] * 3
    in_specs = [anyspec] * SB + state_specs * SB
    out_specs = state_specs * SB

    def sub_shapes():
        out = []
        for i, w in enumerate(carried_widths):
            dt = jnp.float32 if i == 14 else jnp.int32  # regs_f is f32
            out.append(jax.ShapeDtypeStruct((G8, w), dt))
        out.append(jax.ShapeDtypeStruct((G8 * orows, 128), jnp.int32))
        out.append(jax.ShapeDtypeStruct((G8 * vc.r0, 128), jnp.int32))
        out.append(jax.ShapeDtypeStruct((G8 * vc.r1, 128), jnp.int32))
        return out

    out_shape = sub_shapes() * SB

    sub_scratch = [
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
        pltpu.VMEM((L, 128), I32),              # xfer
        pltpu.VMEM((L, 128), I32),              # acw
        pltpu.VMEM((L, 128), jnp.float32),      # acwf
        pltpu.VMEM((L, vc.wbuf), I32),          # winlo (see ph_window)
        # scan_scr (run bitmap): chunk-wide in chunked-scan mode
        pltpu.VMEM((L, vc.scan_chunk or SCANP_), I32),
        # mlen_scr: gated-probe staging ([L, D] when the tier is on;
        # 128-wide unused dummy otherwise so the ref count is static)
        pltpu.VMEM((L, D if vc.probe_gate else 128), I32),
        # wchk: rolling window copy for the chunked scan (dummy if flat)
        pltpu.VMEM((L, vc.wbuf if vc.scan_chunk else 128), I32),
        # Fetch semaphores are PER LANE: the fetched scratch is read
        # right after the wait loop, and a shared counting semaphore is
        # racy there (lane 0's wait can be satisfied by lane 3's
        # completed copy, and Mosaic may schedule lane 0's read before
        # the remaining waits).  Write-back/flush semaphores are shared
        # counters: their dependent accesses are beyond the event-loop
        # back-edge, so only the balanced count matters.  Full per-lane
        # semaphores overflowed the ~2 KB sflag space at SB = 4
        # (measured: 544 semaphores need 2.4 KB).
        pltpu.SemaphoreType.DMA((L,)),          # sem_seg (refill)
        pltpu.SemaphoreType.DMA((L, 6)),        # sem_row (fetch slots)
        pltpu.SemaphoreType.DMA((6,)),          # sem_wb (shared counters)
        pltpu.SemaphoreType.DMA,                # sem_out (shared)
    ]
    scratch = sub_scratch * SB

    cp = vmem_compiler_params(
        SB * sum(L * w * 4 for w in carried_widths), scratch
    )

    def call(texts, *state, interpret=False):
        assert len(texts) == SB and len(state) == N_STATE * SB
        return pl.pallas_call(
            kern,
            grid=(G,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            input_output_aliases={SB + i: i for i in range(N_STATE * SB)},
            scratch_shapes=scratch,
            compiler_params=cp,
            interpret=interpret,
        )(*texts, *state)

    return call
