"""Codec-VM static configuration and state layout.

The codec VM runs the whole x3 event loop (x3.c:372-434 semantics) inside
one Pallas kernel per chunk of events, removing the ~450 us/event XLA
op-dispatch floor measured in round 1 (BENCH_NOTES.md).  Lanes are
processed in groups of ``LANES = 8`` (the Mosaic [L,1]->[L,D] broadcast is
only sound for L <= 8; CLAUDE.md), with groups as sequential grid steps.

State placement (per group, per lane l in 0..7):

VMEM-resident (fits the bench/small-block capacities; see ``vm_supported``):
  * dictionary: 8 LE-u32 word planes packed side by side [8, 8*D] i32,
    plus lens / rank_of / tag_of / index1-model freqs [8, D] i32 each
    (dict.c:105-130 probe runs as dense word compares; MTF permutation
    replaces the per-event cost qsort, dict.c:132-146)
  * ctx hubs (context id 0 of each family — the unknown-pair fallback and
    post-E_NEW reset context, x3.c:63-67): dense [8, H] planes
  * adaptive models ev/ms/ch (x3.c:238-248) as [8, 128/128/256] freq rows
  * per-lane scalar registers: one [8, 128] i32 row + one [8, 128] f32 row
  * the bit-sink window: [8, 2*FLUSH_WORDS] i32, flushed to HBM in 1 KiB
    chunks as lanes fill it (bio.c semantics, LSB-first LE-u32)

HBM-resident, accessed by per-lane row DMA:
  * non-hub context rows, one 128-lane i32 row per context id
    (context.c item lists; find/stats/update run on the DMA'd row in VMEM)
  * promoted rows: PB=16 consecutive HBM rows for contexts that outgrow
    the inline row (capacity skew measured in round 1: p99 tiny, max ~1.5K)
  * the input text (windows DMA'd as 1024-aligned segments, barrel-shifted
    in-kernel to the event position) and the output word stream
"""

from __future__ import annotations

import dataclasses
import os

from x3tpu.config import CodecCaps, MAX_MATCH_LEN, X3Params

_LANES_DEFAULT = int(os.environ.get("X3TPU_VM_LANES", "8"))
# Per-DIRECTION lane widths (rounds 4-5).  The encoder runs L=16 on TPU
# since round 4 (hw_lanes16_identity byte-identical; +19.5% encode; L=32
# is identity-validated too but compile-cliff-marginal — opt-in via
# X3TPU_VM_LANES_ENC=32).  The DECODER runs L=16 on TPU since round 5:
# the L>8 decode miscompile was root-caused to Mosaic rematerializing
# the f32-estimate division chain with reassociated (differently
# rounding) replays, and decode at LANES > 8 now uses the integer-exact
# restoring divider (prims.ac_decode_value) — replay-proof by
# construction.  Validation: 16-block cross-implementation decode EXACT
# (hw_queue_r5g l16dec2), bench round trips at 32 and 128 lanes, decode
# 1.1395 / 1.4245 MB/s (+20% / +14% over L=8).  The two directions
# never share a kernel; the width switches per direction at driver
# entry (set_active_lanes).  Interpret mode is exact at any L.
LANES = _LANES_DEFAULT  # ACTIVE lane width (see set_active_lanes)

_enc_lanes_cached: int | None = None
_dec_lanes_cached: int | None = None


def dec_lanes() -> int:
    """Decoder lane width, resolved lazily on first decode entry:
    X3TPU_VM_LANES_DEC > X3TPU_VM_LANES > backend default (16 on TPU —
    hardware-validated round 5 with the integer-exact divider — 8 on
    CPU, where interpret-mode suite parity stays narrow)."""
    global _dec_lanes_cached
    if _dec_lanes_cached is None:
        env = os.environ.get("X3TPU_VM_LANES_DEC")
        if env is not None:
            _dec_lanes_cached = int(env)
        elif "X3TPU_VM_LANES" in os.environ:
            _dec_lanes_cached = _LANES_DEFAULT
        else:
            import jax

            _dec_lanes_cached = 16 if jax.default_backend() != "cpu" else 8
    return _dec_lanes_cached


def enc_lanes() -> int:
    """Encoder lane width, resolved lazily on first encode entry:
    X3TPU_VM_LANES_ENC > X3TPU_VM_LANES > backend default (16 on TPU —
    the L=16 encoder is hardware-validated, hw_lanes16_identity — 8 on
    CPU, where interpret-mode suite parity stays at the narrow width
    unless a test opts in)."""
    global _enc_lanes_cached
    if _enc_lanes_cached is None:
        env = os.environ.get("X3TPU_VM_LANES_ENC")
        if env is not None:
            _enc_lanes_cached = int(env)
        elif "X3TPU_VM_LANES" in os.environ:
            _enc_lanes_cached = _LANES_DEFAULT
        else:
            import jax

            _enc_lanes_cached = 16 if jax.default_backend() != "cpu" else 8
    return _enc_lanes_cached


def set_active_lanes(n: int) -> None:
    """Switch the active VM lane width.  Called by the four driver entry
    points before any shape computation or kernel build; every VM module
    reads the lane width at call/trace time (Python late binding), so
    poking the module aliases is sufficient.  Within one direction the
    width is process-constant (env-derived), so jit/lru caches keyed
    without it stay consistent."""
    global LANES
    if LANES == n:
        return
    LANES = n
    from x3tpu.vm import driver, kernel, kernel_dec, prims, rows
    driver.LANES = n
    rows.LANES = n
    prims.LANES = n
    kernel.L = n
    kernel_dec.L = n
PB = 16            # HBM rows per promoted context span
IN0 = 63           # inline items, ctx0 family (1 + 2*63 = 127 lanes used)
IN1 = 42           # inline items, ctx1 family (1 + 3*42 = 127)
BIG0 = 896         # promoted items, ctx0 (tags rows 1..7, freqs 8..14)
BIG1 = 640         # promoted items, ctx1 (tags 1..5, freqs 6..10, pair 11..15)
FLUSH_WORDS = 256  # sink flush granule (1 KiB; rank-1 i32 DMA alignment)
SEG_ALIGN = 1024   # text segment DMA alignment (rank-1 u8 memref tile)

# regs_i columns (per-lane i32 scalar registers)
R_P = 0            # input position
R_TLEN = 1         # block length
R_PREV_C1 = 2      # previous context1 (tag)
R_C1 = 3           # context1 (tag)
R_PAIR_N = 4       # registered pair count (next dense pair id)
R_DICT_N = 5       # dictionary entries
R_AC_LOW = 6       # AC low   (u32 value < 2^31, stored as i32)
R_AC_HIGH = 7      # AC high
R_AC_SCALE = 8     # AC underflow counter
R_NBITS = 9        # sink total bits written
R_WIN_BASE = 10    # sink window start, in words (multiple of FLUSH_WORDS)
R_SEG_BASE = 11    # text-segment base byte offset (-1 = invalid)
R_HUB0_N = 12      # ctx0 hub item count
R_HUB1_N = 13      # ctx1 hub item count
R_PROMO0_N = 14    # allocated ctx0 promoted spans
R_PROMO1_N = 15    # allocated ctx1 promoted spans
R_OFLOW = 16       # sticky overflow bits (see OF_*)
R_COUNTS = 17      # 17..21: event counters (x3.c:42)
R_DONE = 22        # lane finished (p >= tlen at loop entry)
# decoder extras
R_SRC_BASE = 23    # source window start, in words
R_OPOS = 24        # decoder output position (bytes)
R_SRC_NW = 25      # readable source words (end-minus-3 rule, bio.c:11)
R_OUT_BASE = 26    # decoder output window base byte offset (OBF-aligned)
R_AC_BUF = 27      # AC decode buffer (31-bit value window, ac.c:133-140)
R_HUGE0_N = 28     # allocated ctx0 huge spans
R_HUGE1_N = 29     # allocated ctx1 huge spans

OBW = 512          # decoder output window bytes (byte-per-i32)
OBF = 256          # output flush granule bytes (2 rows of 128)

OF_DICT = 1
OF_CTX0 = 2
OF_CTX1 = 4
OF_PAIRS = 8
OF_OUT = 16

# regs_f columns: 0..4 = estimated coded bits per event class (x3.c:43)
RF_SIZES = 0


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@dataclasses.dataclass(frozen=True)
class VMCaps:
    """Static VM capacities, derived from CodecCaps via :func:`vm_caps`."""

    dict_cap: int          # D, multiple of 128, <= 32768
    s0: int                # non-hub ctx0 rows per lane (pair capacity - 1)
    m0: int                # promoted ctx0 spans per lane
    m1: int                # promoted ctx1 spans per lane
    hub0: int              # ctx0 hub item capacity
    hub1: int              # ctx1 hub item capacity
    window: int            # search window bytes (params.window)
    block_bytes: int       # per-lane input capacity
    out_words: int         # per-lane output words (multiple of FLUSH_WORDS)
    # huge tier (rows that outgrow a PB-row big span; 0 slots = disabled).
    # A huge span is ONE contiguous HBM block of 1 + nsec*nr2 rows (header
    # + nr2 128-item rows per section), fetched/written as a single DMA —
    # capacity measured on the 4 MB binary regime (/tmp/ref4mb.log: ctx1
    # rows to 7449 items, ctx0 to 1257; see BENCH_NOTES.md)
    h2_0: int = 0          # huge ctx0 spans per lane
    h2_1: int = 0          # huge ctx1 spans per lane
    nr2_0: int = 0         # rows per section in a ctx0 huge span
    nr2_1: int = 0         # rows per section in a ctx1 huge span
    big_trig0: int = BIG0  # big->huge promotion threshold (test hook)
    big_trig1: int = BIG1
    # Tiered dictionary probe (large-D regimes): words 0-1 of the 8-word
    # prefix compare run densely, words 2-7 only under a scalar gate
    # "any entry longer than 8 bytes is still 8-byte-alive" — exact by
    # construction (see kernel.py ph_probe_scan).  Static so default
    # configs compile byte-identical kernels; vm_caps enables it at
    # D >= 4096 where the dense probe dominates the event budget
    # (measured ~20 us/event at D = 24576, round-3 verdict #3).
    probe_gate: bool = False
    # Chunked window scan (round-5 queue #2): 0 = flat scan (the whole
    # [L, SCAN] run computed in one statically-unrolled pass per match
    # round — program size O(window/128 * MML) vector ops, which at
    # window = 32 KiB deterministically crashes the relay compile
    # helper, BENCH_NOTES r4c).  A nonzero value is the chunk width
    # (multiple of 128): the scan runs as a fori_loop over
    # ceil(SCAN/chunk) chunks, each chunk reading a rolling copy of the
    # window (one static-amount roll per iteration), so the PROGRAM is
    # O(chunk/128 * MML) regardless of window.  Exact by construction:
    # run offsets are independent across chunks, tail positions are
    # masked.  Static so default configs compile byte-identical kernels.
    scan_chunk: int = 0

    @property
    def s1(self) -> int:
        # one ctx1 row per tag >= 1
        return self.dict_cap - 1

    @property
    def pb2_0(self) -> int:
        """Rows per ctx0 huge span (header + tags + freqs sections)."""
        return 1 + 2 * self.nr2_0 if self.h2_0 else 1

    @property
    def pb2_1(self) -> int:
        """Rows per ctx1 huge span (header + tags + freqs + pairs)."""
        return 1 + 3 * self.nr2_1 if self.h2_1 else 1

    @property
    def r0(self) -> int:
        # +1: per-lane dump row — unconditional write-backs from inactive
        # lanes land there (a gated-out DMA region costs more than the DMA)
        return self.s0 + self.m0 * PB + self.h2_0 * self.pb2_0 + 1

    @property
    def r1(self) -> int:
        return self.s1 + self.m1 * PB + self.h2_1 * self.pb2_1 + 1

    @property
    def hug0_base(self) -> int:
        """First huge-span row, relative to the big-span base (S+...)."""
        return self.m0 * PB

    @property
    def hug1_base(self) -> int:
        return self.m1 * PB

    @property
    def dump0(self) -> int:
        return self.r0 - 1

    @property
    def dump1(self) -> int:
        return self.r1 - 1

    @property
    def wbuf(self) -> int:
        """Extracted-window width: window + probe lookahead, lane-aligned."""
        w = max(self.window, 2 * MAX_MATCH_LEN)
        return _round_up(w + MAX_MATCH_LEN, 128)

    @property
    def segb(self) -> int:
        """Resident text-segment bytes (alignment slack + window)."""
        return _round_up(self.wbuf, SEG_ALIGN) + 2 * SEG_ALIGN

    @property
    def text_bytes(self) -> int:
        """Per-lane text row: block + segment overhang, SEG_ALIGN-multiple."""
        return _round_up(self.block_bytes + self.segb, SEG_ALIGN)

    @property
    def resident_bytes(self) -> int:
        """Estimated VMEM-resident bytes for ONE 8-lane sub-batch:
        dictionary planes + hubs + window segment + row/huge scratch."""
        return 4 * LANES * (
            (13 if self.probe_gate else 12) * self.dict_cap + 5 * self.hub0
            # seg32 + tseg + winlo (full-window materialization) +
            # scan_scr (~wbuf) + models (+ mlen_scr when probe_gate)
            + (3 * (self.wbuf // 128)
               + _round_up(self.wbuf, SEG_ALIGN) // 128 + 12) * 128
            # chunked scan: + the wchk rolling window copy (scan_scr
            # shrinks from ~wbuf to chunk width, roughly cancelling)
            + (self.wbuf // 128 * 128 if self.scan_chunk else 0)
            + (self.pb2_0 + 2 * self.pb2_1 + 3 * PB + 16) * 128
        )


class VMUnsupported(RuntimeError):
    """The requested configuration exceeds what the VM kernel supports;
    callers fall back to the XLA path."""


def vm_caps(params: X3Params, caps: CodecCaps) -> VMCaps:
    d = caps.dict_cap
    if d % 128 or not 128 <= d <= 32768:
        # dense VMEM dictionary planes: any 128-multiple works; 32K entries
        # covers the measured 4 MB-block regime (21770, /tmp/ref4mb.log)
        raise VMUnsupported(f"dict_cap {d} outside VM range [128, 32768]/128")
    if caps.block_bytes > 16 << 20:
        # 16 MiB is the measured text-class envelope (host.measure_state
        # 2026-08-20: 16 MiB text needs dict 11914, pairs 517K, ctx1 max
        # 2821, ctx0 max 2506 — all VM-hostable).  Diverse BINARY blocks
        # >= 8 MiB exceed the VMEM dictionary ceiling (38K entries
        # measured at 8 MiB vs the 24576 resident cap) — those overflow
        # OF_DICT and the host auto-retry lands them on the XLA path.
        raise VMUnsupported(f"block_bytes {caps.block_bytes} > 16 MiB")
    if params.window > 32 * 1024:
        # 32 KiB verified bit-exact on hardware (probe_w32k 2026-08-17;
        # an earlier-round compile crash no longer reproduces); the
        # segment barrel shift covers any window (off <= 768 by refill)
        raise VMUnsupported(f"window {params.window} > 32 KiB")
    if params.window - MAX_MATCH_LEN - 1 > 8192 and d > 6144:
        # the compile cliff is additive in window + dictionary program
        # terms: w32/d6144 compiles, w32/d8192 kills the compile helper
        # on a HEALTHY relay (hw_w32_bisect, round 5).  caps_for_block
        # sizes big-window configs at <= 6144; a dict-overflow retry
        # doubling past this lands on the XLA path instead of crashing
        # the compile service again.
        raise VMUnsupported(
            f"dict_cap {d} > 6144 at window {params.window} "
            "(compile-size cliff)")
    # hub items are distinct tags, hence <= dict entries <= D: sizing the
    # hub planes to D removes the hub-overflow failure mode entirely
    # (measured: 4 MB binary block grows the hub past the old 1024 cap).
    # Above 8192 the planes are capped to bound VMEM (the hub overflow
    # flag + host auto-retry covers the residual risk); the measured 4 MB
    # binary hub peaks at 7449 items (/tmp/ref4mb.log)
    hub = max(1024, min(d, 8192))
    # huge tier: rows beyond the PB-span capacity live in single large
    # spans.  Sections are capped at 64/16 rows (8192/2048 items) to bound
    # the statically-unrolled masked compute per event
    if caps.ctx_items_cap > BIG1:
        nr2_1 = _round_up(caps.ctx_items_cap, 128) // 128
        if nr2_1 > 64:
            raise VMUnsupported(f"ctx_items_cap {caps.ctx_items_cap} > 8192")
        h2_1 = 128
    else:
        nr2_1, h2_1 = 0, 0
    if caps.ctx0_items_cap > BIG0:
        nr2_0 = _round_up(caps.ctx0_items_cap, 128) // 128
        # 32 sections = 4096 items covers the 16 MiB text-class need
        # (measured ctx0 max 2506; the 4 MiB regime needs 1257)
        if nr2_0 > 32:
            raise VMUnsupported(f"ctx0_items_cap {caps.ctx0_items_cap} > 4096")
        h2_0 = 32
    else:
        nr2_0, h2_0 = 0, 0
    if caps.pair_cap > 1 << 20:
        # a silent clamp here would make a pairs-overflow retry (which
        # doubles pair_cap) re-select the VM at an unchanged effective
        # capacity and re-run into the identical overflow; raising lets
        # the engine dispatch fall back to the XLA path immediately.
        # 1M pairs = 512 MB of ctx0 HBM rows per lane; 16 MiB text
        # measures 517K (the 4 MiB regime keeps its 512K-capped caps,
        # so existing compile caches stay valid)
        raise VMUnsupported(f"pair_cap {caps.pair_cap} > 1M")
    s0 = caps.pair_cap
    # Promotion-pool sizes are PER-LANE resources, not item caps: a
    # pool-exhausted promotion raises the family's overflow flag even
    # when every row fits its tier (the round-5 8 MiB probe failed
    # exactly there).  Measured big-span usage on text
    # (host.measure_state ctx*_big, 2026-08-20): 4 MiB 1120/176,
    # 8 MiB 1758/554, 16 MiB 2633/1058 — the old 1024 cap was too small
    # for MB-blocks in BOTH families.  Huge usage stays tiny (<= 73).
    mb = caps.block_bytes >= 4 << 20
    m0 = min(max(s0 // 32, 64), 2048 if mb else 1024)
    m1 = min(max(d // 4, 64), 4096 if mb else 1024)
    vc = VMCaps(
        dict_cap=d,
        s0=s0,
        m0=m0,
        m1=m1,
        hub0=hub,
        hub1=hub,
        window=params.window,
        block_bytes=caps.block_bytes,
        out_words=_round_up(caps.out_words, FLUSH_WORDS),
        h2_0=h2_0, h2_1=h2_1, nr2_0=nr2_0, nr2_1=nr2_1,
        probe_gate=(d >= 4096),
        # windows past the 8 KiB default get the loop-over-chunks scan
        # (program size stays bounded; the flat scan at w32 crashed the
        # compile helper deterministically, round-4 BENCH_NOTES)
        scan_chunk=(4096 if params.window - MAX_MATCH_LEN - 1 > 8192
                    else 0),
    )
    # VMEM budget for one 8-lane sub-batch.  The per-kernel scoped-VMEM
    # limit can be raised to ~120 MiB (prims.vmem_compiler_params; v5e has
    # 128 MiB physical VMEM), but Mosaic double-counts the aliased in/out
    # blocks on the scoped stack, so the single-sub-batch resident cap
    # stays at 14 MiB — large configs then simply run at SB = 1
    # (pick_subs) instead of being rejected.
    if vc.resident_bytes > 14 << 20:
        raise VMUnsupported(
            f"VMEM-resident state ~{vc.resident_bytes >> 20} MiB "
            "exceeds budget"
        )
    return vc


# sub-batch VMEM budget: SB sub-batches' resident state, doubled by the
# aliased in/out scoped allocation, must clear the ~120 MiB per-kernel
# scoped limit with margin
_SB_BUDGET = 40 << 20
_SB_MAX = 4

# SB > 1 is hardware-CORRECT since the _pack_words wide-op fix
# (db35bb1; hw_sb_diff: SB=2 and SB=4 streams identical to SB=1), but
# measured NOT FASTER: encode is SB-flat (0.60 MB/s at SB in {1,2,4},
# 32x16 KiB bench config) and decode degrades with SB (1.01 / 0.88 /
# 0.72 MB/s) — the per-event cost is serialized on the scalar core, so
# wider grid steps just serialize more sub-batches per step.
# Auto-selection therefore stays at 1 as the fastest product config;
# X3TPU_VM_SUBS and explicit ``subs=`` still override for probes/tests.
_SB_AUTO_MAX = 1


def pick_subs(vc: VMCaps, n_lanes: int) -> int:
    """Sub-batches per grid step: the largest power of two <= _SB_AUTO_MAX
    that the lane count can fill and whose resident state fits the budget.
    ``X3TPU_VM_SUBS`` overrides (hardware scaling probes)."""
    env = os.environ.get("X3TPU_VM_SUBS")
    if env:
        return max(1, int(env))
    groups = max(1, -(-n_lanes // LANES))
    sb = 1
    while (sb < _SB_AUTO_MAX and 2 * sb <= groups
           and 2 * sb * vc.resident_bytes <= _SB_BUDGET):
        sb *= 2
    return sb
