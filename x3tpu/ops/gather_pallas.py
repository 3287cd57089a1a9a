"""Batched per-lane window fetch.

XLA lowers a per-lane dynamic window read (take_along_axis with
``p[l] + iota``) to an elementwise gather at ~19 ns/element — ~640 us for a
[32, 1056] window, the single most expensive operation in the encoder's
event loop.  The reads are actually contiguous per lane, so this module
fetches them as real DMAs:

* ``window_fetch_pallas`` — a Pallas kernel that issues one DMA per lane
  from the flattened text (rank-1, sidestepping Mosaic's tiled-memref
  slicing restriction) into the output buffer.
* ``window_fetch_dynslice`` — XLA fallback: L unrolled dynamic_slices
  (contiguous, still far cheaper than the gather).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
U8 = jnp.uint8


def window_fetch_dynslice(text: jax.Array, p: jax.Array, width: int) -> jax.Array:
    """text[l, p[l] : p[l]+width] via L contiguous dynamic slices."""
    L = text.shape[0]
    rows = [
        jax.lax.dynamic_slice(text, (l, p[l]), (1, width)) for l in range(L)
    ]
    return jnp.concatenate(rows, axis=0)


def _fetch_kernel(starts_s, src_ref, out_ref, sems, *, L, width):
    for l in range(L):
        pltpu.make_async_copy(
            src_ref.at[pl.ds(starts_s[l], width)],
            out_ref.at[pl.ds(l * width, width)],
            sems.at[l],
        ).start()
    for l in range(L):
        pltpu.make_async_copy(
            src_ref.at[pl.ds(starts_s[l], width)],
            out_ref.at[pl.ds(l * width, width)],
            sems.at[l],
        ).wait()


@functools.partial(jax.jit, static_argnames=("width", "interpret"))
def window_fetch_pallas(
    text: jax.Array, p: jax.Array, width: int, interpret: bool = False
) -> jax.Array:
    """text[l, p[l] : p[l]+width] via per-lane DMA (one kernel launch).

    Rank-1 u8 memrefs are tiled by 1024, so the DMA width is rounded up to
    a 1024 multiple (the caller's text padding must cover it)."""
    L, TB = text.shape
    dma_w = (width + 1023) // 1024 * 1024
    flat = text.reshape(L * TB)
    starts = (jnp.arange(L, dtype=I32) * TB + p.astype(I32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((L,))],
    )
    out = pl.pallas_call(
        functools.partial(_fetch_kernel, L=L, width=dma_w),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((L * dma_w,), U8),
        interpret=interpret,
    )(starts, flat)
    return out.reshape(L, dma_w)[:, :width]


def window_fetch(
    text: jax.Array, p: jax.Array, width: int, mode: str = "xla"
) -> jax.Array:
    """Dispatch: 'pallas' | 'pallas_interpret' | 'dynslice' | 'xla'."""
    if mode == "pallas":
        return window_fetch_pallas(text, p, width)
    if mode == "pallas_interpret":
        return window_fetch_pallas(text, p, width, interpret=True)
    if mode == "dynslice":
        return window_fetch_dynslice(text, p, width)
    from x3tpu.ops.match import gather_window

    return gather_window(text, p, width)
