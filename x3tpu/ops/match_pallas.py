"""Fused Pallas matcher: one kernel per event step.

Computes, for all L lanes at once, everything the encoder's match stage
needs (x3.c:381-383, backend.c:56-100, dict.c:105-157):

  * longest-prefix dictionary probe at p (tiled [L, DT, 32] byte compares
    in VMEM; per-entry shared-prefix lengths kept in a VMEM scratch for the
    exact-duplicate query),
  * the forward-window repeated-prefix scan (running prefix-AND over 32
    shifted compares of the DMA'd window),
  * the threshold sweep as argmax over (level, i) keys with the
    magic-factor veto loop inline (veto probes reuse the resident window
    and dictionary, so each round costs only VPU compares — no extra HBM
    traffic),
  * the hit/miss decision, fragment length clamp and duplicate check.

Replaces ~200 small XLA ops (gathers, 32 scan steps, reductions, the veto
while_loop with its own gathers/probes) with a single launch whose inner
loops run entirely out of VMEM.  The XLA fallback (ops/match.py) computes
identical results and is differentially tested against this kernel in
interpreter mode (tests/test_match_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from x3tpu.config import MAX_MATCH_LEN, X3Params

I32 = jnp.int32
U8 = jnp.uint8

_DT = 512  # dictionary tile (entries per probe step)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _select_window32(win_u8: jax.Array, bi: jax.Array) -> jax.Array:
    """win[l, bi[l] : bi[l]+32] (u8) for bi in [0, 32) without dynamic
    gathers: masked select over the 32 static slices."""
    L = win_u8.shape[0]
    out = jnp.zeros((L, MAX_MATCH_LEN), U8)
    for i in range(MAX_MATCH_LEN):
        out = jnp.where((bi == i), win_u8[:, i : i + MAX_MATCH_LEN], out)
    return out


def _probe_best_len(strs_ref, lens_ref, n, target_u8, D):
    """best matching length [L,1] of the longest entry prefixing
    ``target_u8`` [L, 32] (for the magic-factor vetoes)."""
    L = target_u8.shape[0]
    DT = min(_DT, D)
    best_len = jnp.zeros((L, 1), I32)
    j32 = jax.lax.broadcasted_iota(I32, (1, 1, MAX_MATCH_LEN), 2)
    for off in range(0, D, DT):
        strs = strs_ref[:, off : off + DT, :]                # u8 [L, DT, 32]
        lens = lens_ref[:, off : off + DT]                   # [L, DT]
        neq = strs != target_u8[:, None, :]
        mlen = jnp.min(jnp.where(neq, j32, MAX_MATCH_LEN), axis=2)
        slot_iota = jax.lax.broadcasted_iota(I32, (L, DT), 1) + off
        ok = (slot_iota < n) & (lens > 0) & (mlen >= lens)
        cand = jnp.where(ok, lens, 0)
        best_len = jnp.maximum(best_len, jnp.max(cand, axis=1, keepdims=True))
    return best_len


def _matcher_kernel(
    # scalar prefetch
    p_s,
    # inputs
    text_ref, p_ref, tlen_ref, strs_ref, lens_ref, n_ref,
    # outputs
    hit_ref, slot_ref, dlen_ref, fbm_ref, mlen_ref, dup_ref,
    # scratch
    win_ref, mlen_scr, dma_sems,
    *, W, Wbuf, D, L, params: X3Params,
):
    # ---- DMA each lane's window [p, p+Wbuf) into VMEM
    for l in range(L):
        pltpu.make_async_copy(
            text_ref.at[l, pl.ds(p_s[l], Wbuf)], win_ref.at[l], dma_sems.at[l]
        ).start()
    for l in range(L):
        pltpu.make_async_copy(
            text_ref.at[l, pl.ds(p_s[l], Wbuf)], win_ref.at[l], dma_sems.at[l]
        ).wait()

    win = win_ref[:, :]      # u8 [L, Wbuf]
    n = n_ref[:, :]          # [L, 1]
    p = p_ref[:, :]          # [L, 1]
    tlen = tlen_ref[:, :]    # [L, 1]
    DT = min(_DT, D)

    # ---- dictionary probe at p (dict.c:105-130) + per-entry match lengths
    t32 = win[:, :MAX_MATCH_LEN]
    j32 = jax.lax.broadcasted_iota(I32, (1, 1, MAX_MATCH_LEN), 2)
    for off in range(0, D, DT):
        strs = strs_ref[:, off : off + DT, :]
        neq = strs != t32[:, None, :]
        mlen_scr[:, off : off + DT] = jnp.min(
            jnp.where(neq, j32, MAX_MATCH_LEN), axis=2
        )
    slot_iota = jax.lax.broadcasted_iota(I32, (L, D), 1)
    valid = slot_iota < n
    all_lens = lens_ref[:, :]
    ok = valid & (all_lens > 0) & (mlen_scr[:, :] >= all_lens)
    cand = jnp.where(ok, all_lens, 0)
    dlen = jnp.max(cand, axis=1, keepdims=True)
    # integer argmax via min-index-of-max (Mosaic lacks integer argmax)
    slot = jnp.min(
        jnp.where((cand == dlen) & (dlen > 0), slot_iota, D), axis=1,
        keepdims=True,
    )
    slot = jnp.where(slot == D, 0, slot)

    # ---- window scan (backend.c:66-74)
    S = W - MAX_MATCH_LEN - 1
    if S > 0:
        run = jnp.ones((L, S), jnp.bool_)
        cols = []
        for i in range(MAX_MATCH_LEN):
            run = run & (win[:, 1 + i : 1 + i + S] == win[:, i : i + 1])
            cols.append(jnp.sum(run.astype(I32), axis=1, keepdims=True))
        counts = jnp.concatenate(cols, axis=1)  # [L, 32]
    else:
        counts = jnp.zeros((L, MAX_MATCH_LEN), I32)

    # ---- threshold sweep with magic-factor vetoes (backend.c:76-97)
    T = params.max_match_count
    f1, f2 = params.magic_factor1, params.magic_factor2
    iota32 = jax.lax.broadcasted_iota(I32, (L, MAX_MATCH_LEN), 1)
    if T < 1:
        fbm = jnp.ones((L, 1), I32)
    elif f1 == 0 and f2 == 0:
        cand0 = counts >= 2
        level = jnp.minimum(counts - 1, T)
        key = jnp.where(cand0, level * MAX_MATCH_LEN + iota32, -1)
        has = jnp.any(cand0, axis=1, keepdims=True)
        kmax = jnp.max(key, axis=1, keepdims=True)
        best_i = jnp.max(
            jnp.where(key == kmax, iota32, -1), axis=1, keepdims=True
        )
        fbm = jnp.where(has, best_i + 1, 1)
    else:
        cand0 = counts >= 2
        level = jnp.minimum(counts - 1, T)
        result0 = jnp.zeros((L, 1), I32)

        def cond(c):
            result, _ = c
            return jnp.any(result == 0)

        def body(c):
            result, remaining = c
            unresolved = result == 0
            key = jnp.where(remaining, level * MAX_MATCH_LEN + iota32, -1)
            has = jnp.any(remaining, axis=1, keepdims=True)
            kmax = jnp.max(key, axis=1, keepdims=True)
            bi = jnp.max(
                jnp.where(key == kmax, iota32, -1), axis=1, keepdims=True
            )
            bi = jnp.maximum(bi, 0)
            result = jnp.where(unresolved & ~has, 1, result)
            pending = unresolved & has
            vetoed = jnp.zeros((L, 1), jnp.bool_)
            if f1 > 0:
                tgt = _select_window32(win, bi)
                vl = _probe_best_len(strs_ref, lens_ref, n, tgt, D)
                vetoed = vetoed | (
                    pending & (bi >= 2) & (vl > 0) & (vl * f1 > bi + 1)
                )
            if f2 > 0:
                veto2 = jnp.zeros((L, 1), jnp.bool_)
                for o in range(1, MAX_MATCH_LEN):
                    tgt_o = win[:, o : o + MAX_MATCH_LEN]
                    vl_o = _probe_best_len(strs_ref, lens_ref, n, tgt_o, D)
                    veto2 = veto2 | (
                        (o <= bi) & (vl_o > 0) & ((vl_o - o) * f2 > bi + 1)
                    )
                vetoed = vetoed | (pending & (bi >= 1) & veto2)
            result = jnp.where(pending & ~vetoed, bi + 1, result)
            clear = vetoed & (iota32 == bi)
            remaining = remaining & ~clear
            return result, remaining

        fbm, _ = jax.lax.while_loop(cond, body, (result0, cand0))

    # ---- decision (x3.c:381-404)
    if params.nl_remap:
        nl = jnp.where(
            dlen == 1, 1,
            jnp.where(dlen == 2, 4,
                      jnp.where(dlen == 3, 6,
                                jnp.where(dlen == 4, 8, 9999))),
        )
        nl = jnp.where(dlen == 0, 0, nl)
    else:
        nl = dlen
    found = dlen > 0
    hit = found & (nl >= fbm) & (p + dlen <= tlen)
    mlen = jnp.clip(jnp.minimum(fbm, tlen - p), 1, MAX_MATCH_LEN)
    dup = jnp.any(
        valid & (all_lens == mlen) & (mlen_scr[:, :] >= mlen),
        axis=1, keepdims=True,
    )

    hit_ref[:, :] = hit.astype(I32)
    slot_ref[:, :] = slot
    dlen_ref[:, :] = dlen
    fbm_ref[:, :] = fbm
    mlen_ref[:, :] = mlen
    dup_ref[:, :] = dup.astype(I32)


def match_event_pallas(
    text: jax.Array,      # u8 [L, TB] (stays in HBM)
    p: jax.Array,         # i32 [L]
    tlen: jax.Array,      # i32 [L]
    d_strs: jax.Array,    # u8 [L, D, 32]
    d_lens: jax.Array,    # i32 [L, D]
    d_n: jax.Array,       # i32 [L]
    params: X3Params,
    interpret: bool = False,
):
    """Returns (hit, slot, dlen, fbm, mlen, dup) — [L] bool/i32."""
    L, TB = text.shape
    D = d_strs.shape[1]
    W = max(params.window, MAX_MATCH_LEN)
    Wbuf = _round_up(max(W, 2 * MAX_MATCH_LEN) + MAX_MATCH_LEN, 128)
    assert TB >= Wbuf, f"text width {TB} < window buffer {Wbuf}"

    kernel = functools.partial(
        _matcher_kernel, W=W, Wbuf=Wbuf, D=D, L=L, params=params
    )
    out_shape = [jax.ShapeDtypeStruct((L, 1), I32) for _ in range(6)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # text (DMA'd manually)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # p [L,1]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # tlen [L,1]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # strs
            pl.BlockSpec(memory_space=pltpu.VMEM),   # lens
            pl.BlockSpec(memory_space=pltpu.VMEM),   # n [L,1]
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(6)],
        scratch_shapes=[
            pltpu.VMEM((L, Wbuf), U8),
            pltpu.VMEM((L, D), I32),
            pltpu.SemaphoreType.DMA((L,)),
        ],
    )
    hit, slot, dlen, fbm, mlen, dup = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(
        p.astype(I32),                 # scalar prefetch
        text,
        p.astype(I32)[:, None],
        tlen.astype(I32)[:, None],
        d_strs,
        d_lens,
        d_n.astype(I32)[:, None],
    )
    return (
        hit[:, 0] != 0,
        slot[:, 0],
        dlen[:, 0],
        fbm[:, 0],
        mlen[:, 0],
        dup[:, 0] != 0,
    )
