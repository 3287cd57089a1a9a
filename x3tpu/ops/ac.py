"""Lane-parallel 31-bit adaptive arithmetic coder with closed-form
renormalization.

Bit-exact re-implementation of the reference coder's semantics (ac.c):
integer range [0, 0x7FFFFFFF], E1/E2 renormalization with an underflow
counter whose pending bits are emitted as a run, E3 interval expansion, and
the 1-or-(scale+2)-bit flush.

Instead of looping one bit at a time (ac.c:46-75), renormalization is
computed in closed form — the E1/E2 loop emits exactly the common leading
bits of (low, high) in the 31-bit domain, and the E3 count is the length of
the "01…"/"10…" straddle run — so each symbol coding is a fixed O(1) chain
of clz/shift/bit-reverse vector ops plus at most two word-level stores
(reads: one word reload).  Derivations:

  E1/E2:  n  = clz32(low ^ high) - 1          (# common leading bits)
          v  = low >> (31 - n)                (the n emitted bits, MSB-first)
          low' = (low << n) & M31 ;  high' = ((high << n) | (2^n-1)) & M31
  E3:     m  = min(lead-ones(low' after top), lead-zeros(high' after top))
          low'' = (low' << m) - H(2^m - 1)    (u32 wraparound is exact:
          high''= (high' << m) - H(2^m-1) + 2^m - 1      true values < 2^31)
  emission (iff n >= 1): bit b0, then `scale` copies of !b0, then the
  remaining n-1 bits of v; scale resets to 0 and accumulates m.

The per-symbol interval arithmetic (ac.c:77-85) and decoder mirror
(ac.c:128-198, one stream bit per renorm step) are unchanged in semantics;
the decoder consumes n+m <= 31 bits in one masked multi-bit read.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from x3tpu.ops.bitio import (
    BitSink,
    BitSource,
    bitrev32,
    sink_put_bit,
    sink_put_bits,
    source_get_bits,
)

U32 = jnp.uint32
I32 = jnp.int32

TOP = np.uint32(0x7FFFFFFF)
FIRST_QUARTER = np.uint32(0x20000000)
HALF = np.uint32(0x40000000)
THIRD_QUARTER = np.uint32(0x60000000)
M31 = np.uint32(0x7FFFFFFF)


class AcEnc(NamedTuple):
    low: jax.Array    # u32 [L]
    high: jax.Array   # u32 [L]
    scale: jax.Array  # i32 [L]


class AcDec(NamedTuple):
    low: jax.Array    # u32 [L]
    high: jax.Array   # u32 [L]
    buf: jax.Array    # u32 [L]


def enc_init(lanes: int) -> AcEnc:
    return AcEnc(
        low=jnp.zeros((lanes,), U32),
        high=jnp.full((lanes,), TOP, U32),
        scale=jnp.zeros((lanes,), I32),
    )


def _clz32(x: jax.Array) -> jax.Array:
    return jax.lax.clz(x.astype(U32)).astype(I32)


def _renorm_counts(low: jax.Array, high: jax.Array):
    """(n, v, low2, high2, m): E1/E2 emission count + bits and the fully
    renormalized interval."""
    x = low ^ high
    n = _clz32(x) - 1                       # common leading bits (x < 2^31)
    nu = n.astype(U32)
    v = jnp.where(n > 0, low >> (jnp.uint32(31) - nu), 0)
    ones = (jnp.uint32(1) << nu) - 1        # n <= 31 so shift is defined
    low1 = (low << nu) & M31
    high1 = ((high << nu) | ones) & M31

    m1 = _clz32(~(low1 << 2))               # leading ones after low1's top 0
    m2 = _clz32(high1 << 2)                 # leading zeros after high1's top 1
    m = jnp.minimum(jnp.minimum(m1, m2), 30)
    mu = m.astype(U32)
    sub = (HALF << mu) - HALF               # H * (2^m - 1), mod 2^32 (exact)
    low2 = (low1 << mu) - sub
    high2 = (high1 << mu) - sub + (jnp.uint32(1) << mu) - 1
    return n, v, low2, high2, m


def _emit_renorm(
    enc_scale: jax.Array,
    n: jax.Array,
    v: jax.Array,
    sink: BitSink,
    active: jax.Array,
) -> Tuple[BitSink, jax.Array]:
    """Emit b0, the pending underflow run, and the n-1 remaining bits."""
    emit = active & (n > 0)
    b0 = v >> jnp.maximum(n - 1, 0).astype(U32)  # MSB of v
    sink = sink_put_bits(sink, b0 & 1, jnp.where(emit, 1, 0), emit)

    # underflow run: scale copies of !b0 (usually scale == 0: loop skipped)
    rb = (b0 & 1) ^ 1

    def run_cond(c):
        _, left = c
        return jnp.any(emit & (left > 0))

    def run_body(c):
        sink, left = c
        chunk = jnp.minimum(left, 31)
        pat = jnp.where(rb == 1, (jnp.uint32(1) << jnp.maximum(chunk, 0).astype(U32)) - 1,
                        jnp.uint32(0))
        do = emit & (left > 0)
        sink = sink_put_bits(sink, pat, jnp.where(do, chunk, 0), do)
        return sink, left - jnp.where(do, chunk, 0)

    sink, _ = jax.lax.while_loop(run_cond, run_body, (sink, enc_scale))

    # remaining n-1 bits of v, emission order = MSB-first after b0:
    # LSB-first writer wants them bit-reversed.
    tail_n = jnp.maximum(n - 1, 0)
    tail_mask = (jnp.uint32(1) << tail_n.astype(U32)) - 1  # tail_n <= 30
    tail = v & tail_mask
    sh = (jnp.uint32(32) - tail_n.astype(U32)) & 31
    tail_rev = jnp.where(tail_n > 0, bitrev32(tail) >> sh, 0)
    sink = sink_put_bits(sink, tail_rev, jnp.where(emit, tail_n, 0), emit)

    new_scale = jnp.where(emit, 0, enc_scale)
    return sink, new_scale


def ac_encode(
    enc: AcEnc,
    sink: BitSink,
    low_f: jax.Array,
    high_f: jax.Array,
    total: jax.Array,
    active: jax.Array,
) -> Tuple[AcEnc, BitSink]:
    """Code one symbol interval [low_f, high_f) / total per active lane
    (ac.c:77-85) and renormalize in closed form."""
    total_s = jnp.maximum(total.astype(U32), 1)
    step = (enc.high - enc.low + 1) // total_s
    high = enc.low + step * high_f.astype(U32) - 1
    low = enc.low + step * low_f.astype(U32)

    n, v, low2, high2, m = _renorm_counts(low, high)
    sink, scale_after_emit = _emit_renorm(enc.scale, jnp.where(active, n, 0),
                                          v, sink, active)
    new_low = jnp.where(active, low2, enc.low)
    new_high = jnp.where(active, high2, enc.high)
    new_scale = jnp.where(
        active, scale_after_emit + m, enc.scale
    )
    return AcEnc(new_low, new_high, new_scale), sink


def ac_flush(enc: AcEnc, sink: BitSink, active: jax.Array) -> BitSink:
    """Terminate the stream: 1 bit, or (scale+2) bits (ac.c:115-126)."""
    low_branch = enc.low < FIRST_QUARTER
    first_bit = jnp.where(low_branch, jnp.uint32(0), jnp.uint32(1))
    sink = sink_put_bit(sink, first_bit, active)

    def cond(c):
        _, remaining = c
        return jnp.any(active & low_branch & (remaining > 0))

    def body(c):
        sink, remaining = c
        chunk = jnp.minimum(remaining, 31)
        do = active & low_branch & (remaining > 0)
        pat = (jnp.uint32(1) << jnp.maximum(chunk, 0).astype(U32)) - 1
        sink = sink_put_bits(sink, pat, jnp.where(do, chunk, 0), do)
        return sink, remaining - jnp.where(do, chunk, 0)

    sink, _ = jax.lax.while_loop(cond, body, (sink, enc.scale + 1))
    return sink


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def dec_init(src: BitSource, lanes: int) -> Tuple[AcDec, BitSource]:
    """Prime the decode buffer with exactly 31 bits, MSB-first
    (ac.c:133-140)."""
    every = jnp.ones((lanes,), jnp.bool_)
    src, raw = source_get_bits(src, jnp.full((lanes,), 31, I32), every)
    buf = bitrev32(raw) >> 1  # 31 stream bits, first bit most significant
    return AcDec(jnp.zeros((lanes,), U32), jnp.full((lanes,), TOP, U32), buf), src


def ac_decode_value(dec: AcDec, total: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(step, value) of the pending symbol (ac.c:128-131, ac.c:183-185)."""
    total_s = jnp.maximum(total.astype(U32), 1)
    step = (dec.high - dec.low + 1) // total_s
    value = (dec.buf - dec.low) // jnp.maximum(step, 1)
    return step, value


def ac_decode_update(
    dec: AcDec,
    src: BitSource,
    step: jax.Array,
    low_f: jax.Array,
    high_f: jax.Array,
    active: jax.Array,
) -> Tuple[AcDec, BitSource]:
    """Narrow to the decoded symbol's interval and renormalize, consuming
    n+m stream bits in one read (ac.c:142-165, ac.c:192-195)."""
    high = dec.low + step * high_f.astype(U32) - 1
    low = dec.low + step * low_f.astype(U32)

    n, v, low2, high2, m = _renorm_counts(low, high)
    k = jnp.where(active, n + m, 0)
    src, raw = source_get_bits(src, k, active)
    # stream bits arrive LSB-first; the decoder shifts them in MSB-first
    sh = (jnp.uint32(32) - k.astype(U32)) & 31
    grp = jnp.where(k > 0, bitrev32(raw) >> sh, 0)
    g1 = grp >> m.astype(U32)                       # first n bits
    g2 = grp & ((jnp.uint32(1) << m.astype(U32)) - 1)  # last m bits

    nu = n.astype(U32)
    mu = m.astype(U32)
    # E1/E2: buf1 = (buf << n) - (v << 31) + g1   (u32 wraparound exact)
    buf1 = (dec.buf << nu) - (v << 31) + g1
    # E3:    buf2 = (buf1 << m) - H(2^m - 1) + g2
    sub = (HALF << mu) - HALF
    buf2 = (buf1 << mu) - sub + g2

    return (
        AcDec(
            jnp.where(active, low2, dec.low),
            jnp.where(active, high2, dec.high),
            jnp.where(active, buf2, dec.buf),
        ),
        src,
    )
