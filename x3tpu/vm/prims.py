"""Codec-VM in-kernel primitives.

Pure traced helpers shared by the encoder and decoder kernels.  Everything
here sticks to Mosaic-validated patterns (experiments/probe_mosaic.py,
probe2_mosaic.py): [8, 1] broadcasts (sound at L = 8 only), one-hot
scatter-adds, pltpu.roll barrel shifts, scalar-carried while loops with
vector state bridged through scratch refs, and static-unrolled runs.

The arithmetic-coder math mirrors x3tpu/ops/ac.py (itself bit-exact vs the
reference ac.c): closed-form E1/E2/E3 renormalization; the underflow-run
emission is a static unroll of AC_RUN_CHUNKS 31-bit chunks with a sticky
overflow flag for the (astronomically rare) longer runs — the driver
falls back to the XLA path on that flag, so output is never wrong.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from x3tpu.vm.config import LANES

I32 = jnp.int32
U32 = jnp.uint32
F32 = jnp.float32

# plain Python ints: jnp scalars created at module level would be captured
# as closure constants, which pallas kernels reject
TOP = 0x7FFFFFFF
FIRST_QUARTER = 0x20000000
HALF = 0x40000000
M31 = 0x7FFFFFFF

AC_RUN_CHUNKS = 2  # static underflow-run capacity: 2*31 = 62 bits
# (a run needs `scale` consecutive E3 scalings without an E1/E2 emit —
# p ~ 2^-62 per event at 62 bits; the sticky overflow flag + host
# retry keep correctness either way, so shorter unroll = fewer ops)


def col_iota(width: int):
    return jax.lax.broadcasted_iota(I32, (LANES, width), 1)


def get_col(R, col: int):
    return R[:, col : col + 1]


def set_col(R, col: int, val):
    return jnp.where(col_iota(R.shape[1]) == col, val, R)


def f32_of_u32(x):
    """Mosaic has no u32->f32 cast: split the top bit, cast via i32."""
    lo = (x & jnp.uint32(0x7FFFFFFF)).astype(I32).astype(F32)
    hi = (x >> 31).astype(I32).astype(F32)
    return lo + hi * jnp.float32(2147483648.0)


def imul_u32(x, y):
    """u32 product mod 2^32 via i32 multiply (bit-identical; Mosaic's u32
    vector multiply crashes the compiler on this stack — probe4)."""
    return (x.astype(I32) * y.astype(I32)).astype(U32)


def udiv_u32(a, b):
    """Exact (floor(a / b), a % b) for u32 a <= 2^31, b in [1, 2^31].

    Pure-integer restoring long division, 32 static rounds of
    shift/compare/subtract.  An earlier f32-reciprocal variant (probe4
    M4/M4b) was numerically exact but mixing its fptosi/f32-divide chain
    with the bit sink's variable shifts crashes Mosaic ("Unsupported
    target bitwidth for truncation", probe5 S7/S9); all-integer division
    sidesteps the fragile pass entirely.  No overflow: before each shift
    r < b <= 2^31, so (r << 1) | bit <= 2^32 - 1."""
    a = a.astype(U32)
    b = b.astype(U32)
    b = jnp.where(b == 0, jnp.uint32(1), b)  # arith.maxui won't legalize
    q = jnp.zeros_like(a)
    r = jnp.zeros_like(a)
    for i in range(31, -1, -1):
        r = (r << 1) | ((a >> i) & 1)
        ge = r >= b
        r = r - jnp.where(ge, b, 0)
        q = q | jnp.where(ge, jnp.uint32(1) << i, 0)
    return q, r


def mask_u32(count):
    """(1 << count) - 1 for count in [0, 32] (i32 in, u32 out)."""
    c = jnp.minimum(count, 31).astype(U32)
    m = (jnp.uint32(1) << c) - 1
    return jnp.where(count >= 32, jnp.uint32(0xFFFFFFFF), m)


def clz32(x):
    return jax.lax.clz(x.astype(U32)).astype(I32)


def bits_f32(span, total):
    """-log2(span/total) with the reference's f32 semantics (x3.c:52-55)."""
    p = span.astype(F32) / jnp.maximum(total, 1).astype(F32)
    return -jnp.log2(jnp.maximum(p, jnp.float32(1e-38)))


# ---------------------------------------------------------------------------
# Bit sink: a [8, 2*FW] i32 VMEM window + (nbits, win_base) registers.
# Word w of the stream lives at window column (w - win_base); the driver
# flushes full FW-word halves to the HBM output between events.
# ---------------------------------------------------------------------------


def sink_put_bits(win, nbits, win_base, value, count, active):
    """Append up to 32 bits per active lane (LSB of ``value`` first; exact
    mirror of ops/bitio.sink_put_bits).  ``win`` is the window VALUE
    [8, 2FW] i32; returns (win', nbits')."""
    W2 = win.shape[1]
    cnt = jnp.where(active, count.astype(I32), 0)
    v = value.astype(U32) & mask_u32(cnt)
    widx = (nbits >> 5) - win_base
    off = (nbits & 31).astype(U32)
    lo = (v << off).astype(I32)
    sh = (jnp.uint32(32) - off) & 31
    hi = jnp.where(off == 0, jnp.uint32(0), v >> sh).astype(I32)
    put = active & (cnt > 0)
    iota = col_iota(W2)
    win = win + jnp.where((iota == widx) & put, lo, 0)
    win = win + jnp.where((iota == widx + 1) & put, hi, 0)
    return win, nbits + cnt


def ac_enc_renorm_counts(low, high):
    """(n, v, low2, high2, m): closed-form E1/E2 bit count + payload and
    the renormalized interval (ops/ac.py:_renorm_counts, = ac.c:46-75)."""
    x = low ^ high
    n = clz32(x) - 1
    nu = n.astype(U32)
    v = jnp.where(n > 0, low >> (jnp.uint32(31) - nu), 0)
    ones = (jnp.uint32(1) << nu) - 1
    low1 = (low << nu) & M31
    high1 = ((high << nu) | ones) & M31
    m1 = clz32(~(low1 << 2))
    m2 = clz32(high1 << 2)
    m = jnp.minimum(jnp.minimum(m1, m2), 30)
    mu = m.astype(U32)
    half = jnp.uint32(HALF)
    sub = (half << mu) - half
    low2 = (low1 << mu) - sub
    high2 = (high1 << mu) - sub + (jnp.uint32(1) << mu) - 1
    return n, v, low2, high2, m


def bitrev32(x):
    x = ((x & 0x55555555) << 1) | ((x >> 1) & 0x55555555)
    x = ((x & 0x33333333) << 2) | ((x >> 2) & 0x33333333)
    x = ((x & 0x0F0F0F0F) << 4) | ((x >> 4) & 0x0F0F0F0F)
    x = ((x & 0x00FF00FF) << 8) | ((x >> 8) & 0x00FF00FF)
    return (x << 16) | (x >> 16)


def ac_encode(st, low_f, span, total, active, stage_qh=None):
    """Code one interval [low_f, low_f+span)/total per active lane and
    renormalize (ops/ac.py:ac_encode).  ``st`` is a dict with u32 [8,1]
    ``low``/``high``, i32 ``scale``/``nbits``/``win_base``/``oflow`` and
    the i32 [8, 2FW] ``win`` value; returns the updated dict.

    ``stage_qh``: factory of single-use staging hooks (see
    ac_decode_value) — materializes the division's inner high quotient
    AND the final step, each of which feeds two consumers (the decoder's
    L=16 remat miscompile class; prophylactic here for L > 16)."""
    total_u = total.astype(U32)
    total_s = jnp.where(total_u == 0, jnp.uint32(1), total_u)
    step, _ = udiv_u32_fast(st["high"] - st["low"] + 1, total_s,
                            stage=stage_qh() if stage_qh else None)
    if stage_qh is not None:
        step = stage_qh()(step)
    high = st["low"] + imul_u32(step, (low_f + span).astype(U32)) - 1
    low = st["low"] + imul_u32(step, low_f.astype(U32))

    n, v, low2, high2, m = ac_enc_renorm_counts(low, high)
    n = jnp.where(active, n, 0)
    emit = active & (n > 0)

    win, nbits = st["win"], st["nbits"]
    b0 = (v >> jnp.maximum(n - 1, 0).astype(U32)) & 1
    win, nbits = sink_put_bits(
        win, nbits, st["win_base"], b0, jnp.where(emit, 1, 0), emit
    )
    # underflow run: scale copies of !b0, as AC_RUN_CHUNKS static chunks
    rb = (b0 & 1) ^ 1
    left = jnp.where(emit, st["scale"], 0)
    oflow = st["oflow"] | (left > 31 * AC_RUN_CHUNKS)
    for _ in range(AC_RUN_CHUNKS):
        chunk = jnp.clip(left, 0, 31)
        pat = jnp.where(rb == 1, mask_u32(chunk), jnp.uint32(0))
        do = emit & (chunk > 0)
        win, nbits = sink_put_bits(
            win, nbits, st["win_base"], pat, chunk, do
        )
        left = left - chunk
    # remaining n-1 bits of v, MSB-first after b0 -> bit-reversed for the
    # LSB-first writer
    tail_n = jnp.maximum(n - 1, 0)
    tail = v & mask_u32(tail_n)
    sh = (jnp.uint32(32) - tail_n.astype(U32)) & 31
    tail_rev = jnp.where(tail_n > 0, bitrev32(tail) >> sh, 0)
    win, nbits = sink_put_bits(
        win, nbits, st["win_base"], tail_rev, tail_n, emit
    )

    return dict(
        st,
        low=jnp.where(active, low2, st["low"]),
        high=jnp.where(active, high2, st["high"]),
        scale=jnp.where(emit, m, st["scale"] + jnp.where(active, m, 0)),
        win=win,
        nbits=nbits,
        oflow=oflow,
    )


# ---------------------------------------------------------------------------
# Bit source (decoder): a [8, 2*FW] i32 window + (buf, used) registers.
# ---------------------------------------------------------------------------


def src_get_bits(win, bitpos, src_base, nwords, count, active):
    """Read up to 31 bits per active lane starting at absolute stream bit
    ``bitpos`` from the resident source window (first stream bit in the
    LSB).  Columns past ``nwords`` read the sentinel 0x80000000
    (bio.c:30-42).  Returns (value u32 [8,1], bitpos')."""
    W2 = win.shape[1]
    cnt = jnp.where(active, count.astype(I32), 0)
    widx = (bitpos >> 5) - src_base
    off = (bitpos & 31).astype(U32)
    iota = col_iota(W2)
    sent = jnp.int32(-2147483648)  # 0x80000000
    wsel = jnp.where(iota + src_base < nwords, win, sent)
    w0 = jnp.sum(jnp.where(iota == widx, wsel, 0), axis=1, keepdims=True)
    w1 = jnp.sum(jnp.where(iota == widx + 1, wsel, 0), axis=1, keepdims=True)
    lo = w0.astype(U32) >> off
    sh = (jnp.uint32(32) - off) & 31
    hi = jnp.where(off == 0, jnp.uint32(0), w1.astype(U32) << sh)
    val = (lo | hi) & mask_u32(cnt)
    return val, bitpos + cnt


def cumsum_excl(x):
    """Exclusive prefix sum along axis 1 via log2(W) pltpu.roll rounds
    (jnp.cumsum is untested under Mosaic on this stack; roll is proven —
    probe_mosaic.py)."""
    W = x.shape[1]
    iota = col_iota(W)
    acc = x
    sh = 1
    while sh < W:
        rolled = pltpu.roll(acc, sh, axis=1)
        acc = acc + jnp.where(iota >= sh, rolled, 0)
        sh *= 2
    # inclusive -> exclusive
    rolled = pltpu.roll(acc, 1, axis=1)
    return jnp.where(iota >= 1, rolled, 0)


def ac_decode_value(st, total, stage=None, stage_qh=None):
    """(step, value) of the pending symbol (ac.c:128-131, 183-185;
    ops/ac.py:ac_decode_value).  ``st`` carries u32 [8,1] ``low``/``high``/
    ``buf``.

    ``stage``, when given, is applied to ``step`` right after the range
    division and its result is used for BOTH the value division and the
    returned step.  The decoder kernel passes a store-to-scratch-and-
    reread here: ``step`` is a long f32-division + correction chain, and
    at LANES=16 Mosaic rematerialized it between the symbol search and
    ac_decode_update with a different (wrong) schedule — caught by
    hw_l16_dec_inspect 2026-08-20 as low/high diverging by exactly
    step_diff*plow / step_diff*(plow+span) at event 2, lane 1, with
    buf/bitpos/models all identical.  A ref store is a hard
    materialization point (the `_pack_words`/winlo rule)."""
    total_u = total.astype(U32)
    total_s = jnp.where(total_u == 0, jnp.uint32(1), total_u)
    if LANES > 8:
        # Integer-exact division at wide decode lane counts.  The
        # f32-estimate chain in udiv_u32_fast is remat-hazardous at
        # L=16: a replayed f32_of_u32/divide can be reassociated and
        # round differently, yielding two INCONSISTENT copies of the
        # quotient (the round-5 decode miscompile; staging the copies
        # through refs was necessary but not sufficient).  The
        # restoring loop is pure i32 — any replay is bit-identical —
        # at ~4x the op count on [L,1] vectors.  The L=8 default path
        # keeps the fast divider and its byte-identical kernels.
        step, _ = udiv_u32(st["high"] - st["low"] + 1, total_s)
        step_s = jnp.where(step == 0, jnp.uint32(1), step)
        value, _ = udiv_u32(st["buf"] - st["low"], step_s)
        return step, value
    hook = stage_qh() if stage_qh is not None else None
    step, _ = udiv_u32_fast(st["high"] - st["low"] + 1, total_s,
                            stage=hook)
    if stage is not None:
        step = stage(step)
    step_s = jnp.where(step == 0, jnp.uint32(1), step)
    hook2 = stage_qh() if stage_qh is not None else None
    value, _ = udiv_u32_fast(st["buf"] - st["low"], step_s, stage=hook2)
    return step, value


def ac_decode_update(st, step, low_f, span, active):
    """Narrow to the decoded symbol's interval and renormalize, consuming
    n+m stream bits (ac.c:142-165, 192-195; ops/ac.py:ac_decode_update).
    ``st`` is a dict with u32 [8,1] ``low``/``high``/``buf``, i32
    ``bitpos``/``src_base``/``nwords`` and the i32 [8, 2FW] ``win``
    source-window value; returns the updated dict."""
    high = st["low"] + imul_u32(step, (low_f + span).astype(U32)) - 1
    low = st["low"] + imul_u32(step, low_f.astype(U32))

    n, v, low2, high2, m = ac_enc_renorm_counts(low, high)
    k = jnp.where(active, n + m, 0)
    raw, bitpos = src_get_bits(
        st["win"], st["bitpos"], st["src_base"], st["nwords"], k, active
    )
    # stream bits arrive LSB-first; the decoder shifts them in MSB-first
    sh = (jnp.uint32(32) - k.astype(U32)) & 31
    grp = jnp.where(k > 0, bitrev32(raw) >> sh, 0)
    mu = m.astype(U32)
    g1 = grp >> mu                                # first n bits
    g2 = grp & ((jnp.uint32(1) << mu) - 1)        # last m bits

    nu = n.astype(U32)
    # E1/E2: buf1 = (buf << n) - (v << 31) + g1   (u32 wraparound exact)
    buf1 = (st["buf"] << nu) - (v << 31) + g1
    # E3:    buf2 = (buf1 << m) - H(2^m - 1) + g2
    half = jnp.uint32(HALF)
    sub = (half << mu) - half
    buf2 = (buf1 << mu) - sub + g2

    return dict(
        st,
        low=jnp.where(active, low2, st["low"]),
        high=jnp.where(active, high2, st["high"]),
        buf=jnp.where(active, buf2, st["buf"]),
        bitpos=bitpos,
    )


def model_decode(freqs, value, width):
    """Find the symbol of a dense model row whose cumulative interval
    contains ``value`` (models/adaptive.py:model_decode_sym).  Returns
    (sym, low, span)."""
    iota = col_iota(width)
    valid = freqs > 0
    cum = cumsum_excl(freqs)
    le = valid & (cum.astype(U32) <= value)
    sym = jnp.maximum(jnp.sum(le, axis=1, keepdims=True).astype(I32) - 1, 0)
    low = jnp.sum(jnp.where(iota == sym, cum, 0), axis=1, keepdims=True)
    span = jnp.sum(jnp.where(iota == sym, freqs, 0), axis=1, keepdims=True)
    return sym, low, span


def model_decode_cum(cum, value, width):
    """model_decode for a model stored as INCLUSIVE cumulative freqs
    (C[j] = sum of freqs 0..j; trailing unused slots carry the total).
    The interval search needs NO cumsum: live entries are strictly
    increasing (every freq >= 1), trailing slots equal the total and a
    valid stream has value < total, so sym = #{j : C[j] <= value}.
    Returns (sym, low, span); a corrupt stream (value >= total) yields
    sym = width whose masked reads give 0s — garbage-safe, like the
    raw-freq variant's clamping."""
    iota = col_iota(width)
    le = cum.astype(U32) <= value
    sym = jnp.sum(le, axis=1, keepdims=True).astype(I32)
    low = jnp.sum(jnp.where(iota == sym - 1, cum, 0), axis=1, keepdims=True)
    ci = jnp.sum(jnp.where(iota == sym, cum, 0), axis=1, keepdims=True)
    return sym, low, ci - low


def udiv_u32_fast(a, b, stage=None):
    """(floor(a / b), a % b) for u32 a <= 2^31, b in [1, 2^31] via two-stage
    f32 division with exact integer correction (~45 ops vs the restoring
    loop's ~200).  Stage quotients are < 2^16, where f32 division is exact
    to +-1 after floor; a conservative -2 bias plus 4 unrolled correction
    rounds makes the result exact.  Gated by probe8 on hardware (the
    round-1 fptosi+sink crash was later traced to maxui/bool-select
    legalization, both avoided here)."""
    a = a.astype(U32)
    b = b.astype(U32)
    b = jnp.where(b == 0, jnp.uint32(1), b)
    af = f32_of_u32(a)

    def correct(q_est, divisor, limit):
        # q0 <= true quotient guaranteed by the -2 bias; <= 4 rounds up
        q0 = jnp.maximum(q_est - 2, 0).astype(U32)
        r0 = a_cur[0] - imul_u32(q0, divisor)
        for _ in range(4):
            ge = r0 >= divisor
            q0 = q0 + jnp.where(ge, jnp.uint32(1), jnp.uint32(0))
            r0 = r0 - jnp.where(ge, divisor, jnp.uint32(0))
        return q0, r0

    # path A (b > 2^15): quotient < 2^16, one f32 division
    bfA = f32_of_u32(b)
    qA_est = jnp.floor(af / bfA).astype(I32)
    a_cur = [a]
    qA, rA = correct(qA_est, b, None)

    # path B (b <= 2^15): q_hi = a // (b << 16), then low 16 bits
    bh = b << 16
    bfB = f32_of_u32(bh)
    qh_est = jnp.floor(af / bfB).astype(I32)
    a_cur = [a]
    qh, rh = correct(qh_est, bh, None)
    if stage is not None:
        # qh feeds TWO consumers: the low-quotient remainder chain and
        # the (qh << 16) pack.  At LANES=16 Mosaic rematerialized the
        # est+correction chain between them with a WRONG replay —
        # hw_l16_dec_inspect + a spec-oracle division trace caught
        # udiv(1991389184, 2) packing qh=15195 against a remainder from
        # qh=15193 (q off by exactly 2<<16).  Stage qh through a ref and
        # recompute rh from the staged value so both consumers read ONE
        # materialized copy.
        qh = stage(qh)
        rh = a - imul_u32(qh, bh)
    rhf = f32_of_u32(rh)
    ql_est = jnp.floor(rhf / bfA).astype(I32)
    a_cur = [rh]
    ql, rB = correct(ql_est, b, None)
    qB = (qh << 16) | ql

    big_b = b > 0x7FFF
    q = jnp.where(big_b, qA, qB)
    r = jnp.where(big_b, rA, rB)
    return q, r


def vmem_compiler_params(carried_bytes: int, scratch) -> "pltpu.CompilerParams | None":
    """Scoped-VMEM sizing for the VM pallas_calls.

    Mosaic's default scoped-vmem limit is 16 MiB.  The measured footprint
    of these kernels is ~2x the carried state blocks (the grid in + out
    blocks are both allocated on the scoped stack even when aliased) plus
    the scratch shapes: the MB-block huge-row capacities (dict 24576,
    pairs 512K) need ~24 MiB and failed AOT compile with
    "Ran out of memory in memory space vmem ... limit 16.00M" on v5e.
    Raise the per-kernel limit instead of shrinking capacities — v5e has
    128 MiB physical VMEM.  Configs that fit the default limit return
    None so their compiled artifacts (and compile-cache keys) stay
    byte-identical.
    """
    est = 2 * carried_bytes
    for s in scratch:
        shape = getattr(s, "shape", None)
        dtype = getattr(s, "dtype", None)
        if shape is None or dtype is None:
            continue
        try:
            item = jnp.dtype(dtype).itemsize
        except TypeError:  # semaphore refs: negligible
            continue
        n = 1
        for d in shape:
            n *= d
        est += n * item
    if est + 2 * 2**20 <= 16 * 2**20:
        return None
    # the observed scoped need GROWS with the limit (v5e, full capacities:
    # need 23.87M at the 16M default, 34.59M at a 31M limit — Mosaic sizes
    # some buffering relative to available), slope ~0.71: double the
    # estimate plus margin clears the fixed point with room to spare.
    return pltpu.CompilerParams(
        vmem_limit_bytes=min(2 * est + 8 * 2**20, 120 * 2**20)
    )
