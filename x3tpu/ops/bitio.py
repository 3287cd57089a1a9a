"""Lane-parallel bit I/O.

Fixed-shape, batched equivalent of the reference's in-memory bit stream
(bio.c): LSB-first packing into little-endian u32 words.  Every function
operates on all L lanes at once under an ``active`` mask; inactive lanes are
left untouched.  Writes are bounded by the buffer capacity with a sticky
per-lane ``overflow`` flag (the reference instead relies on caller-provided
2x headroom, x3.c:580).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32
I32 = jnp.int32

SENTINEL = np.uint32(0x80000000)  # read-past-end word (bio.c:38)


class BitSink(NamedTuple):
    """Per-lane write stream: words[L, OW] plus total bits written."""

    words: jax.Array    # u32 [L, OW]
    nbits: jax.Array    # i32 [L]
    overflow: jax.Array  # bool [L]

    @property
    def lanes(self) -> int:
        return self.words.shape[0]


def sink_init(lanes: int, out_words: int) -> BitSink:
    return BitSink(
        words=jnp.zeros((lanes, out_words), U32),
        nbits=jnp.zeros((lanes,), I32),
        overflow=jnp.zeros((lanes,), jnp.bool_),
    )


def sink_put_bit(sink: BitSink, bit: jax.Array, active: jax.Array) -> BitSink:
    """Append one bit per active lane (bio_write_bits with n=1, bio.c:49).

    Gather-free: bit positions are written once, so OR == ADD and the
    update is a pure masked scatter-add (lets XLA keep the word buffer
    in place across while_loop iterations)."""
    lanes = sink.lanes
    widx = sink.nbits >> 5
    off = sink.nbits & 31
    cap = sink.words.shape[1]
    oob = widx >= cap
    do = active & ~oob
    lane = jnp.arange(lanes, dtype=I32)
    idx = jnp.where(do, widx, cap)
    words = sink.words.at[lane, idx].add(
        jnp.where(do, bit.astype(U32), 0) << off.astype(U32), mode="drop"
    )
    nbits = sink.nbits + jnp.where(do, 1, 0).astype(I32)
    overflow = sink.overflow | (active & oob)
    return BitSink(words, nbits, overflow)


def sink_byte_len(sink: BitSink) -> jax.Array:
    """Stream length in bytes after the word-granular close (bio.c:105-112:
    the final partial word is flushed zero-padded)."""
    return ((sink.nbits + 31) >> 5) << 2


class BitSource(NamedTuple):
    """Per-lane read stream mirroring struct bio in READ mode."""

    words: jax.Array   # u32 [L, IW]
    nwords: jax.Array  # i32 [L] — readable words (end-minus-3 rule, bio.c:11)
    widx: jax.Array    # i32 [L]
    acc: jax.Array     # u32 [L] — current word (bio.b)
    used: jax.Array    # i32 [L] — bits consumed of acc (bio.c; init 32)


def source_init(words: jax.Array, byte_lens: jax.Array) -> BitSource:
    """``byte_lens`` are the per-lane compressed sizes in bytes; a word at
    byte offset o is readable iff o < size - 3 (bio.c:30-42)."""
    lanes = words.shape[0]
    nwords = jnp.maximum(0, (byte_lens.astype(I32) - 4) // 4 + 1)
    return BitSource(
        words=words,
        nwords=nwords,
        widx=jnp.zeros((lanes,), I32),
        acc=jnp.zeros((lanes,), U32),
        used=jnp.full((lanes,), 32, I32),
    )


def source_get_bit(
    src: BitSource, active: jax.Array
) -> Tuple[BitSource, jax.Array]:
    """Read one bit per active lane; past-the-end reads come from the
    sentinel word 0x80000000 (bio.c:30-42)."""
    lanes = src.words.shape[0]
    need = src.used >= 32
    lane = jnp.arange(lanes, dtype=I32)
    widx_c = jnp.minimum(src.widx, src.words.shape[1] - 1)
    loaded = jnp.where(src.widx < src.nwords, src.words[lane, widx_c], SENTINEL)
    acc = jnp.where(active & need, loaded, src.acc)
    used = jnp.where(active & need, 0, src.used)
    widx = src.widx + jnp.where(active & need, 1, 0).astype(I32)

    bit = (acc & 1).astype(U32)
    acc2 = jnp.where(active, acc >> 1, acc)
    used2 = used + jnp.where(active, 1, 0).astype(I32)
    out_bit = jnp.where(active, bit, 0)
    return BitSource(src.words, src.nwords, widx, acc2, used2), out_bit


# ---------------------------------------------------------------------------
# Word-level multi-bit I/O (closed-form renormalization support)
# ---------------------------------------------------------------------------


def bitrev32(x: jax.Array) -> jax.Array:
    """Reverse the bits of each u32 (5-step butterfly)."""
    x = ((x & 0x55555555) << 1) | ((x >> 1) & 0x55555555)
    x = ((x & 0x33333333) << 2) | ((x >> 2) & 0x33333333)
    x = ((x & 0x0F0F0F0F) << 4) | ((x >> 4) & 0x0F0F0F0F)
    x = ((x & 0x00FF00FF) << 8) | ((x >> 8) & 0x00FF00FF)
    return (x << 16) | (x >> 16)


def _mask_u32(count: jax.Array) -> jax.Array:
    """(1 << count) - 1 for count in [0, 32] without undefined shifts."""
    c = jnp.minimum(count, 31).astype(U32)
    m = (jnp.uint32(1) << c) - 1
    return jnp.where(count >= 32, jnp.uint32(0xFFFFFFFF), m)


def sink_put_bits(
    sink: BitSink, value: jax.Array, count: jax.Array, active: jax.Array
) -> BitSink:
    """Append up to 32 bits per active lane in one step (LSB of ``value``
    is emitted first, matching repeated sink_put_bit)."""
    lanes = sink.lanes
    cap = sink.words.shape[1]
    lane = jnp.arange(lanes, dtype=I32)
    cnt = jnp.where(active, count.astype(I32), 0)
    v = value.astype(U32) & _mask_u32(cnt)

    widx = sink.nbits >> 5
    off = (sink.nbits & 31).astype(U32)

    # fresh bit positions are zero, so OR == ADD: pure scatter-adds keep
    # the buffer in place across loop iterations (no gather+copy)
    idx1 = jnp.where(active & (cnt > 0) & (widx < cap), widx, cap)
    words = sink.words.at[lane, idx1].add(v << off, mode="drop")

    # spill word: v >> (32 - off); zero when off == 0 or no spill
    sh = (jnp.uint32(32) - off) & 31
    spill = jnp.where(off == 0, jnp.uint32(0), v >> sh)
    widx2 = widx + 1
    idx2 = jnp.where(active & (spill != 0) & (widx2 < cap), widx2, cap)
    words = words.at[lane, idx2].add(spill, mode="drop")

    end_bit = sink.nbits + cnt
    overflow = sink.overflow | (active & (cnt > 0) & (end_bit > cap * 32))
    return BitSink(words, end_bit, overflow)


def source_get_bits(
    src: BitSource, count: jax.Array, active: jax.Array
) -> Tuple[BitSource, jax.Array]:
    """Read up to 31 bits per active lane in one step (first stream bit in
    the LSB, matching repeated source_get_bit).  At most one word reload."""
    lanes = src.words.shape[0]
    lane = jnp.arange(lanes, dtype=I32)
    cnt = jnp.where(active, count.astype(I32), 0)

    avail = 32 - src.used
    take1 = jnp.minimum(cnt, avail)
    r1 = src.acc & _mask_u32(take1)
    acc1 = src.acc >> jnp.minimum(take1, 31).astype(U32)

    rem = cnt - take1
    need2 = rem > 0
    widx_c = jnp.minimum(src.widx, src.words.shape[1] - 1)
    loaded = jnp.where(src.widx < src.nwords, src.words[lane, widx_c], SENTINEL)
    r2 = loaded & _mask_u32(rem)
    acc2 = loaded >> jnp.minimum(rem, 31).astype(U32)

    result = jnp.where(need2, r1 | (r2 << jnp.minimum(take1, 31).astype(U32)), r1)
    acc = jnp.where(need2, acc2, acc1)
    used = jnp.where(need2, rem, src.used + take1)
    widx = src.widx + jnp.where(need2, 1, 0).astype(I32)

    acc = jnp.where(active, acc, src.acc)
    used = jnp.where(active, used, src.used)
    widx = jnp.where(active, widx, src.widx)
    return BitSource(src.words, src.nwords, widx, acc, used), jnp.where(
        active, result, 0
    )
