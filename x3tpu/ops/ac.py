"""Lane-parallel 31-bit adaptive arithmetic coder.

Fixed-shape, batched re-implementation of the reference coder's exact
semantics (ac.c): integer range [0, 0x7FFFFFFF], E1/E2 renormalization with
an underflow counter whose pending bits are emitted as a run, E3 interval
expansion, and the 1-or-(scale+2)-bit flush.  Each of L lanes carries an
independent (low, high, scale) triple; renormalization runs as nested masked
``lax.while_loop``s so lanes stay in lockstep without divergence.

All frequency arguments are plain int32 arrays [L]; interval arithmetic is
uint32 (the 31-bit invariant keeps every intermediate < 2**32).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from x3tpu.ops.bitio import BitSink, BitSource, sink_put_bit, source_get_bit

U32 = jnp.uint32
I32 = jnp.int32

TOP = jnp.uint32(0x7FFFFFFF)
FIRST_QUARTER = jnp.uint32(0x20000000)
HALF = jnp.uint32(0x40000000)
THIRD_QUARTER = jnp.uint32(0x60000000)


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


def _renorm_enc(
    enc: AcEnc, sink: BitSink, active: jax.Array
) -> Tuple[AcEnc, BitSink]:
    """E1/E2 loop with pending-scale runs, then E3 (ac.c:46-75)."""

    def e12_cond(carry):
        enc, _ = carry
        need = active & ((enc.high < HALF) | (enc.low >= HALF))
        return jnp.any(need)

    def e12_body(carry):
        enc, sink = carry
        e1 = enc.high < HALF
        need = active & (e1 | (enc.low >= HALF))
        bit = jnp.where(e1, jnp.uint32(0), jnp.uint32(1))
        sink = sink_put_bit(sink, bit, need)
        low = jnp.where(e1, enc.low * 2, (enc.low - HALF) * 2)
        high = jnp.where(e1, enc.high * 2 + 1, (enc.high - HALF) * 2 + 1)
        low = jnp.where(need, low, enc.low)
        high = jnp.where(need, high, enc.high)
        # flush the underflow run: scale copies of the complement bit
        inv = jnp.uint32(1) - bit

        def run_cond(c):
            _, scale = c
            return jnp.any(need & (scale > 0))

        def run_body(c):
            sink, scale = c
            emit = need & (scale > 0)
            sink = sink_put_bit(sink, inv, emit)
            return sink, scale - jnp.where(emit, 1, 0).astype(I32)

        sink, scale = jax.lax.while_loop(run_cond, run_body, (sink, enc.scale))
        return AcEnc(low, high, scale), sink

    enc, sink = jax.lax.while_loop(e12_cond, e12_body, (enc, sink))

    def e3_cond(enc):
        need = active & (FIRST_QUARTER <= enc.low) & (enc.high < THIRD_QUARTER)
        return jnp.any(need)

    def e3_body(enc):
        need = active & (FIRST_QUARTER <= enc.low) & (enc.high < THIRD_QUARTER)
        low = jnp.where(need, (enc.low - FIRST_QUARTER) * 2, enc.low)
        high = jnp.where(need, (enc.high - FIRST_QUARTER) * 2 + 1, enc.high)
        scale = enc.scale + jnp.where(need, 1, 0).astype(I32)
        return AcEnc(low, high, scale)

    enc = jax.lax.while_loop(e3_cond, e3_body, enc)
    return enc, sink


def ac_encode(
    enc: AcEnc,
    sink: BitSink,
    low_f: jax.Array,
    high_f: jax.Array,
    total: jax.Array,
    active: jax.Array,
) -> Tuple[AcEnc, BitSink]:
    """Code one symbol interval [low_f, high_f) / total per active lane
    (ac.c:77-85)."""
    total_s = jnp.maximum(total.astype(U32), 1)  # inactive lanes: avoid /0
    step = (enc.high - enc.low + 1) // total_s
    high = enc.low + step * high_f.astype(U32) - 1
    low = enc.low + step * low_f.astype(U32)
    enc = AcEnc(
        jnp.where(active, low, enc.low),
        jnp.where(active, high, enc.high),
        enc.scale,
    )
    return _renorm_enc(enc, sink, active)


def ac_flush(enc: AcEnc, sink: BitSink, active: jax.Array) -> BitSink:
    """Terminate the stream: 1 bit, or (scale+2) bits (ac.c:115-126)."""
    low_branch = enc.low < FIRST_QUARTER
    first_bit = jnp.where(low_branch, jnp.uint32(0), jnp.uint32(1))
    sink = sink_put_bit(sink, first_bit, active)
    # low branch: scale+1 additional 1-bits
    def cond(c):
        _, remaining = c
        return jnp.any(active & low_branch & (remaining > 0))

    def body(c):
        sink, remaining = c
        emit = active & low_branch & (remaining > 0)
        sink = sink_put_bit(sink, jnp.uint32(1), emit)
        return sink, remaining - jnp.where(emit, 1, 0).astype(I32)

    sink, _ = jax.lax.while_loop(cond, body, (sink, enc.scale + 1))
    return sink


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def dec_init(src: BitSource, lanes: int) -> Tuple[AcDec, BitSource]:
    """Prime the decode buffer with exactly 31 bits, MSB-first
    (ac.c:133-140)."""
    every = jnp.ones((lanes,), jnp.bool_)
    buf = jnp.zeros((lanes,), U32)
    for _ in range(31):
        src, bit = source_get_bit(src, every)
        buf = (buf << 1) | bit
    return AcDec(jnp.zeros((lanes,), U32), jnp.full((lanes,), TOP, U32), buf), src


def ac_decode_value(dec: AcDec, total: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(step, value) of the pending symbol (ac.c:128-131, ac.c:183-185).
    The caller searches its model for the symbol whose cumulative interval
    contains ``value``."""
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
    one bit per E1/E2/E3 step (ac.c:142-165, ac.c:192-195)."""
    high = dec.low + step * high_f.astype(U32) - 1
    low = dec.low + step * low_f.astype(U32)
    dec = AcDec(
        jnp.where(active, low, dec.low),
        jnp.where(active, high, dec.high),
        dec.buf,
    )

    def e12_cond(carry):
        dec, _ = carry
        need = active & ((dec.high < HALF) | (dec.low >= HALF))
        return jnp.any(need)

    def e12_body(carry):
        dec, src = carry
        e1 = dec.high < HALF
        need = active & (e1 | (dec.low >= HALF))
        src, bit = source_get_bit(src, need)
        low = jnp.where(e1, dec.low * 2, (dec.low - HALF) * 2)
        high = jnp.where(e1, dec.high * 2 + 1, (dec.high - HALF) * 2 + 1)
        buf = jnp.where(e1, dec.buf * 2 + bit, (dec.buf - HALF) * 2 + bit)
        return (
            AcDec(
                jnp.where(need, low, dec.low),
                jnp.where(need, high, dec.high),
                jnp.where(need, buf, dec.buf),
            ),
            src,
        )

    dec, src = jax.lax.while_loop(e12_cond, e12_body, (dec, src))

    def e3_cond(carry):
        dec, _ = carry
        need = active & (FIRST_QUARTER <= dec.low) & (dec.high < THIRD_QUARTER)
        return jnp.any(need)

    def e3_body(carry):
        dec, src = carry
        need = active & (FIRST_QUARTER <= dec.low) & (dec.high < THIRD_QUARTER)
        src, bit = source_get_bit(src, need)
        low = (dec.low - FIRST_QUARTER) * 2
        high = (dec.high - FIRST_QUARTER) * 2 + 1
        buf = (dec.buf - FIRST_QUARTER) * 2 + bit
        return (
            AcDec(
                jnp.where(need, low, dec.low),
                jnp.where(need, high, dec.high),
                jnp.where(need, buf, dec.buf),
            ),
            src,
        )

    dec, src = jax.lax.while_loop(e3_cond, e3_body, (dec, src))
    return dec, src
