"""Lane-parallel adaptive frequency models (ac.c:200-273).

A model is a freq vector [L, M] (+ optional live count for the growing
order-0 index model).  The reference's per-update cumulative-frequency
rebuild (count_cum_freqs, ac.c:6-18) disappears: coding computes the three
masked reductions (low_f, span, total) directly, and decoding uses one
vector cumsum — both O(M) lane-wide ops.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

I32 = jnp.int32


def model_encode_stats(
    freqs: jax.Array, sym: jax.Array, count: Optional[jax.Array] = None
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(low_f, span, total) for coding ``sym`` [L] from ``freqs`` [L, M].
    Frequencies at positions >= count must be zero (maintained by inc/grow)."""
    lanes, M = freqs.shape
    lane = jnp.arange(lanes, dtype=I32)
    iota = jnp.arange(M, dtype=I32)[None, :]
    low = jnp.sum(jnp.where(iota < sym[:, None], freqs, 0), axis=1)
    span = freqs[lane, jnp.minimum(sym, M - 1)]
    total = jnp.sum(freqs, axis=1)
    return low, span, total


def model_decode_sym(
    freqs: jax.Array, value: jax.Array, count: Optional[jax.Array] = None
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Find the symbol whose interval contains ``value`` (u32 [L]).
    Returns (sym, low_f, span)."""
    lanes, M = freqs.shape
    lane = jnp.arange(lanes, dtype=I32)
    iota = jnp.arange(M, dtype=I32)[None, :]
    valid = (iota < count[:, None]) if count is not None else (freqs > 0)
    cum = jnp.cumsum(freqs, axis=1) - freqs  # exclusive prefix
    le = valid & (cum.astype(jnp.uint32) <= value[:, None])
    sym = jnp.maximum(jnp.sum(le, axis=1).astype(I32) - 1, 0)
    low = cum[lane, sym]
    span = freqs[lane, sym]
    return sym, low, span


def model_inc(freqs: jax.Array, sym: jax.Array, active: jax.Array) -> jax.Array:
    """freq[sym] += 1 per active lane (inc_model, ac.c:215-228)."""
    lanes, M = freqs.shape
    lane = jnp.arange(lanes, dtype=I32)
    s = jnp.minimum(sym, M - 1)
    return freqs.at[lane, s].add(jnp.where(active, 1, 0).astype(freqs.dtype))


def f32_prob(span: jax.Array, total: jax.Array) -> jax.Array:
    """f32 probability estimate matching C float semantics
    ((float)freq / total, ac.c:108-113)."""
    return span.astype(jnp.float32) / total.astype(jnp.float32)
