"""Codec-VM host driver: state init, chunked kernel launches, finalize.

API-compatible with codec.encode_blocks_chunked: returns (words u32
[L, OW], byte_lens, counts, sizes, Overflow).  The EOF symbol and AC flush
(x3.c:432-433, ac.c:115-126) run through the existing XLA coder on the
merged bit sink — one tiny dispatch, zero duplicated bit-format logic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from x3tpu import codec
from x3tpu.config import CodecCaps, E_EOF, E_LAST, EVENT_INIT_FREQS, X3Params
from x3tpu.models import adaptive as am
from x3tpu.ops import ac as acm
from x3tpu.ops import bitio
from x3tpu.vm.config import (
    LANES, OF_CTX0, OF_CTX1, OF_DICT, OF_OUT,
    OF_PAIRS, R_AC_HIGH, R_AC_LOW, R_AC_SCALE, R_COUNTS, R_DICT_N,
    R_HUB0_N, R_HUB1_N, R_NBITS, R_OFLOW, R_P, R_PAIR_N, R_TLEN,
    R_WIN_BASE, VMCaps, VMUnsupported, dec_lanes, enc_lanes, pick_subs,
    set_active_lanes, vm_caps,
)
from x3tpu.vm.kernel import N_STATE, build_encoder_call

I32 = jnp.int32
U32 = jnp.uint32


# ---------------------------------------------------------------------------
# Sub-batch layout: a grid step runs SB sub-batches of 8 lanes, each with
# fully separate state arrays (kernel.py).  Merged layout maps lane i to
# row i with i = (g*SB + s)*LANES + l; the splitters below are exact
# inverses, so input lane order is preserved end to end.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("G", "SB", "rows"))
def _split_rows(arr, G: int, SB: int, rows: int):
    """(G*SB*LANES*rows, cols) -> SB arrays of (G*LANES*rows, cols)."""
    cols = arr.shape[1]
    r = arr.reshape(G, SB, LANES * rows, cols)
    return tuple(r[:, s].reshape(G * LANES * rows, cols) for s in range(SB))


def _split_state(state, G: int, SB: int, vc: VMCaps, hbm_rows,
                 n_vmem: int = 16):
    """Merged state tuple -> flat per-sub-batch tuple (s-major)."""
    per_arr = []
    for k, arr in enumerate(state):
        rows = 1 if k < n_vmem else hbm_rows[k - n_vmem]
        per_arr.append(_split_rows(arr, G, SB, rows))
    return tuple(per_arr[k][s] for s in range(SB) for k in range(len(state)))


@functools.partial(jax.jit, static_argnames=("G", "SB", "rows"))
def _merge_rows(parts, G: int, SB: int, rows: int):
    cols = parts[0].shape[1]
    stacked = jnp.stack(
        [p.reshape(G, LANES * rows, cols) for p in parts], axis=1
    )
    return stacked.reshape(G * SB * LANES * rows, cols)


def _merge_state(flat, G: int, SB: int, vc: VMCaps, hbm_rows,
                 n=N_STATE, n_vmem: int = 16):
    """Inverse of _split_state: flat per-sub-batch tuple -> merged tuple."""
    out = []
    for k in range(n):
        parts = tuple(flat[s * n + k] for s in range(SB))
        rows = 1 if k < n_vmem else hbm_rows[k - n_vmem]
        out.append(_merge_rows(parts, G, SB, rows))
    return tuple(out)


def _seed_dict_arrays(seeds, G8: int, D: int):
    """Seeded dictionary planes (dictw, dlens, drank, dtago, ixf, d_n) —
    the VM mirror of codec._init_shared's seed broadcast (codec.py:89-125):
    K fragments pre-inserted at tags/slots 0..K-1, recency ranks 0..K-1."""
    seed_strs, seed_lens = seeds  # u8 [K, 32], i32 [K]
    K = seed_strs.shape[0]
    s32 = jnp.asarray(seed_strs, I32)
    dictw = jnp.zeros((G8, 8 * D), I32)
    for w in range(8):
        word = (s32[:, 4 * w] | (s32[:, 4 * w + 1] << 8)
                | (s32[:, 4 * w + 2] << 16) | (s32[:, 4 * w + 3] << 24))
        dictw = dictw.at[:, w * D : w * D + K].set(word[None, :])
    dlens = jnp.zeros((G8, D), I32).at[:, :K].set(
        jnp.asarray(seed_lens, I32)[None, :]
    )
    iota = jnp.arange(D, dtype=I32)
    drank = jnp.tile(iota[None, :], (G8, 1))
    dtago = jnp.tile(iota[None, :], (G8, 1))
    # ixf stores the index model as an INCLUSIVE cumulative-freq row
    # (kernel.py ph_mode note): K freq-1 entries -> C[j] = min(j+1, K)
    ixf = jnp.tile(jnp.minimum(iota + 1, K)[None, :], (G8, 1))
    return dictw, dlens, drank, dtago, ixf, K


def _warm_hubs_regs(warm, regs, h0t, h0f, h1t, h1f, h1p, G8):
    """Apply the model warm-start (container v2, x3tpu/warm.py) to the
    hub planes + registers; returns the updated arrays.  Same lockstep
    rule as dictionary seeds: both sides rebuild identical state from
    the container's (seeds, tape)."""
    H0 = warm["h0t"].shape[0]
    H1 = warm["h1t"].shape[0]
    h0t = h0t.at[:, :H0].set(warm["h0t"][None])
    h0f = h0f.at[:, :H0].set(warm["h0f"][None])
    h1t = h1t.at[:, :H1].set(warm["h1t"][None])
    h1f = h1f.at[:, :H1].set(warm["h1f"][None])
    h1p = h1p.at[:, :H1].set(warm["h1p"][None])
    # cumulative freq planes carry the total past the item count
    # (rows.py tail-total invariant)
    i0 = jnp.arange(h0f.shape[1], dtype=I32)[None, :]
    h0f = jnp.where(i0 >= H0, warm["h0tot"], h0f)
    i1 = jnp.arange(h1f.shape[1], dtype=I32)[None, :]
    h1f = jnp.where(i1 >= H1, warm["h1tot"], h1f)
    regs = regs.at[:, R_PAIR_N].set(
        jnp.full((G8,), 1, I32) * warm["pair_n"])
    regs = regs.at[:, R_HUB0_N].set(jnp.full((G8,), 1, I32) * warm["h0n"])
    regs = regs.at[:, R_HUB1_N].set(jnp.full((G8,), 1, I32) * warm["h1n"])
    return regs, h0t, h0f, h1t, h1f, h1p


def _warm_hbm_rows(warm, c0r, c1r, G8, r0, r1):
    """Scatter the warm inline context rows into the per-lane HBM row
    arrays (vm/rows.py inline layout)."""
    lanes = jnp.arange(G8, dtype=I32)
    i0 = warm["c0_idx"]
    if i0.shape[0]:
        flat0 = (lanes[:, None] * r0 + i0[None, :]).reshape(-1)
        c0r = c0r.at[flat0].set(
            jnp.tile(warm["c0_rows"], (G8, 1)))
    i1 = warm["c1_idx"]
    if i1.shape[0]:
        flat1 = (lanes[:, None] * r1 + i1[None, :]).reshape(-1)
        c1r = c1r.at[flat1].set(
            jnp.tile(warm["c1_rows"], (G8, 1)))
    return c0r, c1r


@functools.partial(jax.jit, static_argnames=("vc", "G"))
def _init_state(text_flat, tlen, vc: VMCaps, G: int, seeds=None, warm=None):
    """Initial VM state tuple (kernel inputs 1..19).  ``text_flat`` is the
    byte-per-i32 text [G8*trows, 128]; ``tlen`` i32 [G8]."""
    G8 = G * LANES
    D = vc.dict_cap

    def z(w, dt=jnp.int32):
        return jnp.zeros((G8, w), dt)

    regs = z(128)
    regs = regs.at[:, R_TLEN].set(tlen.astype(I32))
    regs = regs.at[:, R_AC_HIGH].set(jnp.int32(0x7FFFFFFF))
    if seeds is None:
        dictw, dlens, drank, dtago, ixf = z(8 * D), z(D), z(D), z(D), z(D)
    else:
        dictw, dlens, drank, dtago, ixf, K = _seed_dict_arrays(seeds, G8, D)
        regs = regs.at[:, R_DICT_N].set(K)
    ev = z(128).at[:, : len(EVENT_INIT_FREQS)].set(
        jnp.asarray(EVENT_INIT_FREQS, I32)[None, :]
    )
    ms = z(128).at[:, :32].set(1)
    ch = jnp.ones((G8, 256), I32)
    orows = vc.out_words // 128
    h0t, h0f = z(vc.hub0), z(vc.hub0)
    h1t, h1f, h1p = z(vc.hub1), z(vc.hub1), z(vc.hub1)
    c0r = jnp.zeros((G8 * vc.r0, 128), I32)
    c1r = jnp.zeros((G8 * vc.r1, 128), I32)
    if warm is not None:
        regs, h0t, h0f, h1t, h1f, h1p = _warm_hubs_regs(
            warm, regs, h0t, h0f, h1t, h1f, h1p, G8)
        c0r, c1r = _warm_hbm_rows(warm, c0r, c1r, G8, vc.r0, vc.r1)
    return (
        dictw, dlens, drank, dtago, ixf,
        h0t, h0f, h1t, h1f, h1p,
        ev, ms, ch, regs, z(128, jnp.float32), z(512),
        jnp.zeros((G8 * orows, 128), I32),
        c0r, c1r,
    )


@jax.jit
def _any_active(regs):
    return jnp.any(regs[:, R_P] < regs[:, R_TLEN])


@functools.partial(jax.jit, static_argnames=("vc",))
def _finalize(state, vc: VMCaps):
    """Merge sink windows, code EOF, flush (mirror of codec.enc_finalize)."""
    regs = state[13]
    regsf = state[14]
    sinkwin = state[15]
    orows = vc.out_words // 128
    G8 = regs.shape[0]
    outw = state[16].reshape(G8, orows * 128)

    win_base = regs[:, R_WIN_BASE]
    outw = jax.vmap(
        lambda row, w, b: jax.lax.dynamic_update_slice(row, w, (b,))
    )(outw, sinkwin, win_base)

    sink = bitio.BitSink(
        words=outw.astype(U32),
        nbits=regs[:, R_NBITS],
        overflow=(regs[:, R_OFLOW] & OF_OUT) != 0,
    )
    enc = acm.AcEnc(
        low=regs[:, R_AC_LOW].astype(U32),
        high=regs[:, R_AC_HIGH].astype(U32),
        scale=regs[:, R_AC_SCALE],
    )
    ev5 = state[10][:, :E_LAST]
    every = jnp.ones((G8,), jnp.bool_)
    eofsym = jnp.full((G8,), E_EOF, I32)
    elow, espan, etot = am.model_encode_stats(ev5, eofsym)
    enc, sink = acm.ac_encode(enc, sink, elow, elow + espan, etot, every)
    sink = acm.ac_flush(enc, sink, every)

    counts = regs[:, R_COUNTS : R_COUNTS + E_LAST]
    sizes = regsf[:, :E_LAST]
    of = regs[:, R_OFLOW]
    overflow = codec.Overflow(
        dict=(of & OF_DICT) != 0,
        ctx0=(of & OF_CTX0) != 0,
        ctx1=(of & OF_CTX1) != 0,
        pairs=(of & OF_PAIRS) != 0,
        out=sink.overflow,
    )
    return sink.words, bitio.sink_byte_len(sink), counts, sizes, overflow


@functools.partial(jax.jit, static_argnames=("vc", "G", "tb_in"))
def _prep_text(text_u8, vc: VMCaps, G: int, tb_in: int):
    """[L, TB_in] u8 -> byte-per-i32 [G8*trows, 128], zero-padded."""
    G8 = G * LANES
    L_in = text_u8.shape[0]
    tb = vc.text_bytes
    t = text_u8.astype(I32)
    if tb_in < tb:
        t = jnp.pad(t, ((0, 0), (0, tb - tb_in)))
    else:
        t = t[:, :tb]
    if L_in < G8:
        t = jnp.pad(t, ((0, G8 - L_in), (0, 0)))
    return t.reshape(G8 * (tb // 128), 128)


def _enc_caps_adaptive(params: X3Params, caps: CodecCaps) -> VMCaps:
    """Derive VM capacities at the encoder lane width, falling back to
    8 lanes when the wide width alone blows the VMEM-resident budget
    (large-D configs double their resident planes at L=16; the narrow
    kernel is correct everywhere, so prefer it over an XLA demotion)."""
    set_active_lanes(enc_lanes())
    try:
        return vm_caps(params, caps)
    except VMUnsupported:
        if enc_lanes() == 8:
            raise
        set_active_lanes(8)
        return vm_caps(params, caps)


_VMEM_BUDGET = 14 << 20  # single-sub-batch resident cap (vm/config.py)


def _set_enc_lanes_checked(vc: VMCaps) -> None:
    """Explicit-vc encode entry: switch to the encoder width, then
    re-validate the VMEM budget at that width (VMCaps.resident_bytes
    reads the ACTIVE lane count) — the same try-wide-fallback-8 rule as
    _enc_caps_adaptive, for callers that built ``vc`` while a different
    width was active (e.g. right after a decode at a large-D config)."""
    set_active_lanes(enc_lanes())
    if vc.resident_bytes <= _VMEM_BUDGET:
        return
    if enc_lanes() == 8:
        raise VMUnsupported(
            f"VMEM-resident state ~{vc.resident_bytes >> 20} MiB "
            "exceeds budget"
        )
    set_active_lanes(8)
    if vc.resident_bytes > _VMEM_BUDGET:
        raise VMUnsupported(
            f"VMEM-resident state ~{vc.resident_bytes >> 20} MiB "
            "exceeds budget even at 8 lanes"
        )


@functools.lru_cache(maxsize=8)
def _get_step(vc: VMCaps, params: X3Params, nsteps: int, G: int,
              interpret: bool, ablate: frozenset = frozenset(),
              SB: int = 1, lanes: int = 8):
    # ``lanes`` exists only to key the cache on the active lane width
    # (the kernel builder reads it from the module globals at build time)
    call = build_encoder_call(vc, params, nsteps, G, ablate, SB=SB)

    donate = tuple(range(SB, SB + N_STATE * SB))

    @functools.partial(jax.jit, donate_argnums=donate)
    def step(*args):
        return call(args[:SB], *args[SB:], interpret=interpret)

    return step


@functools.partial(jax.jit, static_argnames=("SB",))
def _any_active_subs(flat, SB: int):
    a = jnp.bool_(False)
    for s in range(SB):
        regs = flat[s * N_STATE + 13]
        a = a | jnp.any(regs[:, R_P] < regs[:, R_TLEN])
    return a


def encode_blocks_vm_chunked(
    text, tlen, params: X3Params, caps: CodecCaps, seeds=None,
    chunk_steps: int = 4096, interpret: bool = False,
    ablate: frozenset = frozenset(), vc: VMCaps = None, subs: int = 0,
    warm=None,
):
    """Chunked codec-VM encode; same contract as
    codec.encode_blocks_chunked.  Raises VMUnsupported for configurations
    the kernel cannot host (callers fall back to the XLA path).  ``vc``
    overrides the derived VM capacities (tests use it to lower the
    big->huge promotion trigger); ``subs`` overrides the sub-batch count
    (0 = auto via pick_subs)."""
    if vc is None:
        vc = _enc_caps_adaptive(params, caps)
    else:
        _set_enc_lanes_checked(vc)
    if seeds is not None and seeds[0].shape[0] > vc.dict_cap:
        raise VMUnsupported("more dictionary seeds than dict_cap")
    L_in, tb_in = text.shape
    sb = subs or pick_subs(vc, L_in)
    G = max(1, -(-L_in // (sb * LANES)))   # grid steps (SB*8 lanes each)
    Gt = G * sb                            # 8-lane groups, merged layout
    G8 = Gt * LANES
    trows = vc.text_bytes // 128
    orows = vc.out_words // 128
    hbm_rows = (orows, vc.r0, vc.r1)

    text_flat = _prep_text(jnp.asarray(text, jnp.uint8), vc, Gt, tb_in)
    tlen_np = np.asarray(tlen)
    tlen_p = jnp.pad(jnp.asarray(tlen, I32), (0, G8 - L_in))
    state = _init_state(text_flat, tlen_p, vc, Gt, seeds=seeds,
                        warm=warm)
    texts = _split_rows(text_flat, G, sb, trows)
    flat = _split_state(state, G, sb, vc, hbm_rows)
    step = _get_step(vc, params, chunk_steps, G, interpret, ablate,
                     SB=sb, lanes=LANES)
    # every event consumes >= 1 input byte (hit: dlen >= 1; miss: mlen is
    # clipped to >= 1), so ceil(max tlen / chunk_steps) launches always
    # finish the block — dispatch them ASYNC (a finished launch exits its
    # while-loop immediately) instead of paying a ~33 ms device readback
    # per launch (probe9: only a value read synchronizes via the tunnel)
    bound = max(1, -(-int(tlen_np.max(initial=0)) // chunk_steps))
    for _ in range(bound):
        flat = step(*texts, *flat)
    extra = 0
    while bool(_any_active_subs(flat, sb)):  # safety net; never hit
        if extra > 2:
            raise RuntimeError(
                "VM encode did not terminate: a lane made no progress "
                f"after {bound + extra} launches (kernel bug?)"
            )
        flat = step(*texts, *flat)
        extra += 1
    state = _merge_state(flat, G, sb, vc, hbm_rows)
    words, byte_lens, counts, sizes, overflow = _finalize(state, vc)
    sl = slice(0, L_in)
    return (
        words[sl],
        byte_lens[sl],
        counts[sl],
        sizes[sl],
        codec.Overflow(*[getattr(overflow, f)[sl] for f in overflow._fields]),
    )


# ---------------------------------------------------------------------------
# Decoder driver
# ---------------------------------------------------------------------------

from x3tpu.vm.config import (  # noqa: E402
    FLUSH_WORDS, OBF, OBW, R_AC_BUF, R_DONE, R_OPOS, R_OUT_BASE, R_SRC_NW,
)
from x3tpu.vm.kernel_dec import N_STATE_DEC, build_decoder_call  # noqa: E402


def _dec_srows(vc: VMCaps, in_words: int) -> int:
    """Per-lane source rows: the whole stream buffer plus refill margin."""
    return (in_words + 127) // 128 + 2 * (FLUSH_WORDS // 128)


def _dec_obrows(vc: VMCaps) -> int:
    """Per-lane output byte rows (byte-per-i32) with window margin."""
    return (vc.block_bytes + 127) // 128 + 2 * (OBF // 128) + 2


@functools.partial(jax.jit, static_argnames=("vc", "G", "srows", "obrows"))
def _init_state_dec(words, byte_lens, vc: VMCaps, G: int, srows: int,
                    obrows: int, seeds=None, warm=None):
    """Initial decoder VM state (kernel inputs 1..20).  ``words`` is the
    compressed stream u32 [L, IW]; ``byte_lens`` its per-lane sizes."""
    G8 = G * LANES
    D = vc.dict_cap
    L_in, IW = words.shape

    def z(w, dt=jnp.int32):
        return jnp.zeros((G8, w), dt)

    # source rows: byte order is word-per-i32 (words laid out 128/row)
    w_i = words.astype(jnp.int32)
    if L_in < G8:
        w_i = jnp.pad(w_i, ((0, G8 - L_in), (0, 0)))
        byte_lens = jnp.pad(jnp.asarray(byte_lens, I32), (0, G8 - L_in))
    else:
        byte_lens = jnp.asarray(byte_lens, I32)
    pad_w = srows * 128 - IW
    srcflat = jnp.pad(w_i, ((0, 0), (0, pad_w))).reshape(G8 * srows, 128)

    # prime the AC decode buffer with exactly 31 bits (ac.c:133-140),
    # through the XLA bit source for exactness
    src = bitio.source_init(w_i.astype(U32), byte_lens)
    dec, _src2 = acm.dec_init(src, G8)

    srcwin = jnp.pad(w_i, ((0, 0), (0, max(0, 2 * FLUSH_WORDS - IW))))[
        :, : 2 * FLUSH_WORDS
    ].astype(I32)

    regs = z(128)
    regs = regs.at[:, R_AC_HIGH].set(jnp.int32(0x7FFFFFFF))
    regs = regs.at[:, R_AC_BUF].set(dec.buf.astype(I32))
    regs = regs.at[:, R_NBITS].set(31)
    regs = regs.at[:, R_SRC_NW].set(src.nwords)
    regs = regs.at[:, R_DONE].set((byte_lens <= 0).astype(I32))
    if seeds is None:
        dictw, dlens, drank, dtago, ixf = z(8 * D), z(D), z(D), z(D), z(D)
    else:
        dictw, dlens, drank, dtago, ixf, K = _seed_dict_arrays(seeds, G8, D)
        regs = regs.at[:, R_DICT_N].set(K)
    ev = z(128).at[:, : len(EVENT_INIT_FREQS)].set(
        jnp.asarray(EVENT_INIT_FREQS, I32)[None, :]
    )
    ms = z(128).at[:, :32].set(1)
    ch = jnp.ones((G8, 256), I32)
    h0t, h0f = z(vc.hub0), z(vc.hub0)
    h1t, h1f, h1p = z(vc.hub1), z(vc.hub1), z(vc.hub1)
    c0r = jnp.zeros((G8 * vc.r0, 128), I32)
    c1r = jnp.zeros((G8 * vc.r1, 128), I32)
    if warm is not None:
        regs, h0t, h0f, h1t, h1f, h1p = _warm_hubs_regs(
            warm, regs, h0t, h0f, h1t, h1f, h1p, G8)
        c0r, c1r = _warm_hbm_rows(warm, c0r, c1r, G8, vc.r0, vc.r1)
    return srcflat, (
        dictw, dlens, drank, dtago, ixf,
        h0t, h0f, h1t, h1f, h1p,
        ev, ms, ch, regs, z(128, jnp.float32),
        srcwin, z(OBW),
        jnp.zeros((G8 * obrows, 128), I32),
        c0r, c1r,
    )


@jax.jit
def _any_active_dec(regs):
    return jnp.any(regs[:, R_DONE] == 0)


@functools.partial(jax.jit, static_argnames=("SB",))
def _any_active_dec_subs(flat, SB: int):
    a = jnp.bool_(False)
    for s in range(SB):
        regs = flat[s * N_STATE_DEC + 13]
        a = a | jnp.any(regs[:, R_DONE] == 0)
    return a


@functools.partial(jax.jit, static_argnames=("vc", "obrows"))
def _finalize_dec(state, vc: VMCaps, obrows: int):
    """Merge the resident output window, unpack bytes, collect stats."""
    regs = state[13]
    regsf = state[14]
    outwin = state[16]
    G8 = regs.shape[0]
    outb = state[17].reshape(G8, obrows * 128)

    out_base = regs[:, R_OUT_BASE]
    outb = jax.vmap(
        lambda row, w, b: jax.lax.dynamic_update_slice(row, w, (b,))
    )(outb, outwin, out_base)

    out = outb[:, : vc.block_bytes].astype(jnp.uint8)
    opos = regs[:, R_OPOS]
    counts = regs[:, R_COUNTS : R_COUNTS + E_LAST]
    sizes = regsf[:, :E_LAST]
    of = regs[:, R_OFLOW]
    overflow = codec.Overflow(
        dict=(of & OF_DICT) != 0,
        ctx0=(of & OF_CTX0) != 0,
        ctx1=(of & OF_CTX1) != 0,
        pairs=(of & OF_PAIRS) != 0,
        out=(of & OF_OUT) != 0,
    )
    return out, opos, counts, sizes, overflow


@functools.lru_cache(maxsize=8)
def _get_step_dec(vc: VMCaps, params: X3Params, nsteps: int, G: int,
                  srows: int, obrows: int, interpret: bool, SB: int = 1,
                  ablate: frozenset = frozenset(), lanes: int = 8):
    call = build_decoder_call(vc, params, nsteps, G, srows, obrows, SB=SB,
                              ablate=ablate)

    donate = tuple(range(SB, SB + N_STATE_DEC * SB))

    @functools.partial(jax.jit, donate_argnums=donate)
    def step(*args):
        return call(args[:SB], *args[SB:], interpret=interpret)

    return step


def decode_blocks_vm_chunked(
    words, byte_lens, params: X3Params, caps: CodecCaps, seeds=None,
    chunk_steps: int = 4096, interpret: bool = False, vc: VMCaps = None,
    subs: int = 0, ablate: frozenset = frozenset(), warm=None,
    max_launches: int = 0,
):
    """Chunked codec-VM decode; same contract as
    codec.decode_blocks_chunked: returns (out u8 [L, block_bytes],
    out_lens, counts, sizes, Overflow)."""
    set_active_lanes(dec_lanes())
    if vc is None:
        vc = vm_caps(params, caps)
    if seeds is not None and seeds[0].shape[0] > vc.dict_cap:
        raise VMUnsupported("more dictionary seeds than dict_cap")
    L_in, IW = words.shape
    sb = subs or pick_subs(vc, L_in)
    G = max(1, -(-L_in // (sb * LANES)))
    Gt = G * sb
    srows = _dec_srows(vc, IW)
    obrows = _dec_obrows(vc)
    hbm_rows = (obrows, vc.r0, vc.r1)

    srcflat, state = _init_state_dec(
        jnp.asarray(words, U32), jnp.asarray(byte_lens, I32), vc, Gt,
        srows, obrows, seeds=seeds, warm=warm,
    )
    srcs = _split_rows(srcflat, G, sb, srows)
    flat = _split_state(state, G, sb, vc, hbm_rows, n_vmem=17)
    step = _get_step_dec(vc, params, chunk_steps, G, srows, obrows,
                         interpret, SB=sb, ablate=ablate, lanes=LANES)
    # decode events each emit >= 1 output byte, so launches are bounded by
    # ceil((block_bytes+1)/chunk_steps) — but the actual output length is
    # unknown up front, so dispatch in async batches of 4 between ~33 ms
    # device readbacks (probe9) instead of syncing every launch; finished
    # launches exit their while-loop immediately
    bound = max(1, -(-(vc.block_bytes + 1) // chunk_steps))
    done_launches = 0
    batch = 4
    while bool(_any_active_dec_subs(flat, sb)):
        if max_launches and done_launches >= max_launches:
            break  # bisect harnesses: partial decode by construction
        # a valid stream finishes within `bound` launches (every decode
        # event except the final EOF emits >= 1 output byte); a lane still
        # active past that is decoding a malformed/corrupt stream whose
        # events make no progress — raise instead of spinning forever
        if done_launches > bound + 2:
            raise ValueError(
                "VM decode did not terminate: malformed stream "
                f"(active lanes after {done_launches} launches)"
            )
        # async batches between ~33 ms tunnel syncs, DOUBLING each round:
        # the output length is unknown up front, but a finished launch
        # exits its while-loop immediately, so over-dispatch is nearly
        # free while every sync stalls the device for a full tunnel
        # round trip.  Fixed batches of 4 cost bound/4 syncs (~64 at a
        # 4 MiB block — the measured 2.3x wave-vs-kernel decode gap at
        # 1-lane MB configs); exponential growth costs O(log bound).
        # max_launches (bisect harnesses) caps the INNER batch too —
        # otherwise chunk_steps=1 probes asking for k events run 4, 12,
        # 28, ... and misreport the first-divergence position.
        n = max(1, min(batch, bound - done_launches))
        if max_launches:
            n = min(n, max_launches - done_launches)
        for _ in range(n):
            flat = step(*srcs, *flat)
            done_launches += 1
        batch = min(2 * batch, 256)
    state = _merge_state(flat, G, sb, vc, hbm_rows, n=N_STATE_DEC,
                         n_vmem=17)
    out, opos, counts, sizes, overflow = _finalize_dec(state, vc, obrows)
    sl = slice(0, L_in)
    return (
        out[sl], opos[sl], counts[sl], sizes[sl],
        codec.Overflow(*[getattr(overflow, f)[sl] for f in overflow._fields]),
    )


# ---------------------------------------------------------------------------
# Sharded (multi-device) drivers: the same chunked VM launches with lanes
# sharded over the 1-D block mesh via shard_map — each device runs its own
# Pallas grid over its local lane groups, no cross-device synchronization
# inside a launch (SURVEY.md §7.6 block-DP decomposition, at VM speed)
# ---------------------------------------------------------------------------

from jax.sharding import NamedSharding, PartitionSpec as _P  # noqa: E402

try:  # jax >= 0.6 moved shard_map to the top level
    from jax import shard_map as _shard_map  # noqa: E402
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map  # noqa: E402

_AXIS = "blocks"


@functools.lru_cache(maxsize=8)
def _get_step_sharded(vc: VMCaps, params: X3Params, nsteps: int, Gd: int,
                      interpret: bool, mh, SB: int = 1, lanes: int = 8):
    """Per-device VM encode launch, shard_mapped over the block mesh.
    ``Gd`` is the per-device grid (SB*8-lane steps)."""
    call = build_encoder_call(vc, params, nsteps, Gd, SB=SB)

    def local(*args):
        return call(args[:SB], *args[SB:], interpret=interpret)

    sm = _shard_map(
        local, mesh=mh.mesh,
        in_specs=(_P(_AXIS),) * (SB + N_STATE * SB),
        out_specs=(_P(_AXIS),) * (N_STATE * SB),
        check_vma=False,
    )
    return jax.jit(sm, donate_argnums=tuple(range(SB, SB + N_STATE * SB)))


def encode_blocks_vm_sharded(
    text, tlen, params: X3Params, caps: CodecCaps, mesh, seeds=None,
    chunk_steps: int = 16384, interpret: bool = False, vc: VMCaps = None,
    subs: int = 0, warm=None,
):
    """Mesh-sharded codec-VM encode; same contract as
    mesh.encode_sharded / encode_blocks_vm_chunked."""
    from x3tpu.parallel.mesh import MeshHolder

    if vc is None:
        vc = _enc_caps_adaptive(params, caps)
    else:
        _set_enc_lanes_checked(vc)
    if seeds is not None and seeds[0].shape[0] > vc.dict_cap:
        raise VMUnsupported("more dictionary seeds than dict_cap")
    nd = mesh.devices.size
    L_in, tb_in = text.shape
    lanes_dev = max(1, -(-L_in // nd))
    sb = subs or pick_subs(vc, lanes_dev)
    Gd = max(1, -(-lanes_dev // (sb * LANES)))
    G = Gd * nd                           # total grid steps
    Gt = G * sb                           # 8-lane groups, merged layout
    G8 = Gt * LANES
    trows = vc.text_bytes // 128
    orows = vc.out_words // 128
    hbm_rows = (orows, vc.r0, vc.r1)

    text_flat = _prep_text(jnp.asarray(text, jnp.uint8), vc, Gt, tb_in)
    tlen_np = np.asarray(tlen)
    tlen_p = jnp.pad(jnp.asarray(tlen, I32), (0, G8 - L_in))
    state = _init_state(text_flat, tlen_p, vc, Gt, seeds=seeds,
                        warm=warm)
    texts = _split_rows(text_flat, G, sb, trows)
    flat = _split_state(state, G, sb, vc, hbm_rows)
    sharding = NamedSharding(mesh, _P(_AXIS))
    texts = tuple(jax.device_put(t, sharding) for t in texts)
    flat = tuple(jax.device_put(s, sharding) for s in flat)
    step = _get_step_sharded(vc, params, chunk_steps, Gd, interpret,
                             MeshHolder(mesh), SB=sb, lanes=LANES)
    bound = max(1, -(-int(tlen_np.max(initial=0)) // chunk_steps))
    for _ in range(bound):
        flat = step(*texts, *flat)
    extra = 0
    while bool(_any_active_subs(flat, sb)):  # safety net; never hit
        if extra > 2:
            raise RuntimeError(
                "VM encode did not terminate: a lane made no progress "
                f"after {bound + extra} launches (kernel bug?)"
            )
        flat = step(*texts, *flat)
        extra += 1
    state = _merge_state(flat, G, sb, vc, hbm_rows)
    words, byte_lens, counts, sizes, overflow = _finalize(state, vc)
    sl = slice(0, L_in)
    return (
        words[sl],
        byte_lens[sl],
        counts[sl],
        sizes[sl],
        codec.Overflow(*[getattr(overflow, f)[sl] for f in overflow._fields]),
    )


@functools.lru_cache(maxsize=8)
def _get_step_dec_sharded(vc: VMCaps, params: X3Params, nsteps: int, Gd: int,
                          srows: int, obrows: int, interpret: bool, mh,
                          SB: int = 1, lanes: int = 8):
    call = build_decoder_call(vc, params, nsteps, Gd, srows, obrows, SB=SB)

    def local(*args):
        return call(args[:SB], *args[SB:], interpret=interpret)

    sm = _shard_map(
        local, mesh=mh.mesh,
        in_specs=(_P(_AXIS),) * (SB + N_STATE_DEC * SB),
        out_specs=(_P(_AXIS),) * (N_STATE_DEC * SB),
        check_vma=False,
    )
    return jax.jit(sm, donate_argnums=tuple(range(SB, SB + N_STATE_DEC * SB)))


def decode_blocks_vm_sharded(
    words, byte_lens, params: X3Params, caps: CodecCaps, mesh, seeds=None,
    chunk_steps: int = 16384, interpret: bool = False, vc: VMCaps = None,
    subs: int = 0, warm=None,
):
    """Mesh-sharded codec-VM decode (see encode_blocks_vm_sharded)."""
    from x3tpu.parallel.mesh import MeshHolder

    set_active_lanes(dec_lanes())
    if vc is None:
        vc = vm_caps(params, caps)
    if seeds is not None and seeds[0].shape[0] > vc.dict_cap:
        raise VMUnsupported("more dictionary seeds than dict_cap")
    nd = mesh.devices.size
    L_in, IW = words.shape
    lanes_dev = max(1, -(-L_in // nd))
    sb = subs or pick_subs(vc, lanes_dev)
    Gd = max(1, -(-lanes_dev // (sb * LANES)))
    G = Gd * nd
    Gt = G * sb
    srows = _dec_srows(vc, IW)
    obrows = _dec_obrows(vc)
    hbm_rows = (obrows, vc.r0, vc.r1)

    srcflat, state = _init_state_dec(
        jnp.asarray(words, U32), jnp.asarray(byte_lens, I32), vc, Gt,
        srows, obrows, seeds=seeds, warm=warm,
    )
    srcs = _split_rows(srcflat, G, sb, srows)
    flat = _split_state(state, G, sb, vc, hbm_rows, n_vmem=17)
    sharding = NamedSharding(mesh, _P(_AXIS))
    srcs = tuple(jax.device_put(t, sharding) for t in srcs)
    flat = tuple(jax.device_put(s, sharding) for s in flat)
    step = _get_step_dec_sharded(vc, params, chunk_steps, Gd, srows, obrows,
                                 interpret, MeshHolder(mesh), SB=sb,
                                 lanes=LANES)
    bound = max(1, -(-(vc.block_bytes + 1) // chunk_steps))
    done_launches = 0
    batch = 4
    while bool(_any_active_dec_subs(flat, sb)):
        if done_launches > bound + 2:  # see the single-device driver
            raise ValueError(
                "VM decode did not terminate: malformed stream "
                f"(active lanes after {done_launches} launches)"
            )
        # doubling async batches (see the single-device driver): syncs
        # cost a tunnel round trip each, over-dispatch is nearly free
        for _ in range(max(1, min(batch, bound - done_launches))):
            flat = step(*srcs, *flat)
            done_launches += 1
        batch = min(2 * batch, 256)
    state = _merge_state(flat, G, sb, vc, hbm_rows, n=N_STATE_DEC,
                         n_vmem=17)
    out, opos, counts, sizes, overflow = _finalize_dec(state, vc, obrows)
    sl = slice(0, L_in)
    return (
        out[sl], opos[sl], counts[sl], sizes[sl],
        codec.Overflow(*[getattr(overflow, f)[sl] for f in overflow._fields]),
    )
