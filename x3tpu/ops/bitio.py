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

U32 = jnp.uint32
I32 = jnp.int32

SENTINEL = jnp.uint32(0x80000000)  # read-past-end word (bio.c:38)


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
    """Append one bit per active lane (bio_write_bits with n=1, bio.c:49)."""
    lanes = sink.lanes
    widx = sink.nbits >> 5
    off = sink.nbits & 31
    cap = sink.words.shape[1]
    oob = widx >= cap
    widx_c = jnp.minimum(widx, cap - 1)
    lane = jnp.arange(lanes, dtype=I32)
    cur = sink.words[lane, widx_c]
    val = cur | (bit.astype(U32) << off.astype(U32))
    do = active & ~oob
    words = sink.words.at[lane, widx_c].set(jnp.where(do, val, cur))
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
