"""Codec-VM kernel tests (interpreter mode, CPU).

The VM kernel (x3tpu/vm/kernel.py) runs the whole event loop
(x3.c:372-434 semantics) in one Pallas program; these tests keep it
bit-exact against the spec oracle and behavior-identical (including
overflow flagging) to the XLA chunked driver it replaces on TPU.
Interpreter mode executes the same traced program without Mosaic, so
everything here runs on the CPU test mesh.
"""

import os
import pathlib
import subprocess
import sys

import numpy as np
import pytest

from x3tpu import codec, spec
from x3tpu.config import CodecCaps, X3Params
from x3tpu.vm import VMUnsupported, encode_blocks_vm_chunked

GOLDEN = pathlib.Path(__file__).parent / "golden"


def _subprocess_isolated(fn):
    """Run the decorated test in a FRESH pytest subprocess.

    The suite's pre-existing set of giant interpret-mode VM compiles is
    reliable, but each ADDED one segfaults XLA:CPU when it lands late in
    a long same-process run (observed at the promotion test and again at
    the 32K-window test, 2026-08-17/18; every one passes standalone).
    Serializing these executables for the compile cache crashes too, so
    caching can't help — new giant compiles get a fresh process instead."""
    import functools

    @functools.wraps(fn)
    def wrapper(*a, **k):
        if os.environ.get("X3TPU_VM_ISOLATED_CHILD") == "1":
            return fn(*a, **k)
        env = dict(os.environ, X3TPU_VM_ISOLATED_CHILD="1")
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider",
             f"{__file__}::{fn.__name__}"],
            env=env, capture_output=True, text=True, timeout=1800,
        )
        assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-800:])

    return wrapper


PARAMS = X3Params(max_match_count=4, window=256)


def _blocks():
    golden = (GOLDEN / "text_small.bin").read_bytes()
    rng = np.random.default_rng(7)
    return [
        b"abracadabra " * 40,
        b"",
        golden[:1200],
        rng.integers(0, 256, 400, np.uint8).tobytes(),
        b"A",
        b"\x00" * 1200,
    ]


def _encode_vm(blocks, params, caps, chunk_steps=4096):
    text, tlen = codec.pack_blocks(blocks, params, caps)
    return encode_blocks_vm_chunked(
        text, tlen, params, caps, chunk_steps=chunk_steps, interpret=True
    )


def test_vm_encoder_matches_spec():
    caps = CodecCaps(
        dict_cap=1024, pair_cap=2048, ctx_items_cap=128,
        ctx0_items_cap=128, ctx_small_cap=16, block_bytes=2048,
    )
    blocks = _blocks()
    words, byte_lens, counts, sizes, of = _encode_vm(blocks, PARAMS, caps)
    words = np.asarray(words)
    byte_lens = np.asarray(byte_lens)
    for f in of._fields:
        assert not np.asarray(getattr(of, f)).any(), f"overflow {f}"
    for i, b in enumerate(blocks):
        got = words[i].astype("<u4").tobytes()[: byte_lens[i]]
        assert got == spec.encode(b, PARAMS), f"block {i} ({len(b)}B)"


def test_vm_overflow_parity_with_xla():
    """At deliberately tiny capacities the VM must flag exactly the lanes
    the XLA driver flags (the host auto-retry contract) and stay bit-exact
    on the rest."""
    caps = CodecCaps(
        dict_cap=128, pair_cap=512, ctx_items_cap=128,
        ctx0_items_cap=128, ctx_small_cap=16, block_bytes=2048,
    )
    blocks = _blocks()
    text, tlen = codec.pack_blocks(blocks, PARAMS, caps)
    vw, vl, vc, _, vof = encode_blocks_vm_chunked(
        text, tlen, PARAMS, caps, chunk_steps=711, interpret=True
    )
    import jax.numpy as jnp

    xw, xl, xc, _, xof = codec.encode_blocks_chunked(
        jnp.asarray(text), jnp.asarray(tlen), PARAMS, caps
    )
    v_any = np.zeros(len(blocks), bool)
    x_any = np.zeros(len(blocks), bool)
    for f in vof._fields:
        v_any |= np.asarray(getattr(vof, f))
        x_any |= np.asarray(getattr(xof, f))
    assert (v_any == x_any).all(), (v_any, x_any)
    vw, vl = np.asarray(vw), np.asarray(vl)
    xw, xl = np.asarray(xw), np.asarray(xl)
    for i in range(len(blocks)):
        if v_any[i]:
            continue
        got = vw[i].astype("<u4").tobytes()[: vl[i]]
        want = xw[i].astype("<u4").tobytes()[: xl[i]]
        assert got == want, f"lane {i}"
        assert (np.asarray(vc)[i] == np.asarray(xc)[i]).all()


@_subprocess_isolated
def test_vm_lanes_asymmetric_roundtrip():
    """Per-direction lane widths (round 4): encode at L=16, decode at
    L=8 in ONE process.  Encoder streams must be lane-width-invariant
    (byte-identical to the spec oracle) and the narrow decoder must
    round-trip them — the interpret-mode twin of the hardware default
    (enc_lanes()=16 on TPU while the L=16 decoder still miscompiles)."""
    from x3tpu.vm import config as vmc, decode_blocks_vm_chunked

    caps = CodecCaps(
        dict_cap=1024, pair_cap=2048, ctx_items_cap=128,
        ctx0_items_cap=128, ctx_small_cap=16, block_bytes=2048,
    )
    base = _blocks()
    blocks = (base * 3)[:18]  # 2 groups at L=16, 3 at L=8
    old = vmc._enc_lanes_cached
    vmc._enc_lanes_cached = 16
    try:
        words, byte_lens, _, _, of = _encode_vm(blocks, PARAMS, caps)
        assert vmc.LANES == 16  # the encode ran at the wide width
        words, byte_lens = np.asarray(words), np.asarray(byte_lens)
        for f in of._fields:
            assert not np.asarray(getattr(of, f)).any(), f"overflow {f}"
        for i, b in enumerate(blocks):
            got = words[i].astype("<u4").tobytes()[: byte_lens[i]]
            assert got == spec.encode(b, PARAMS), f"block {i} ({len(b)}B)"
        out, opos, _, _, dof = decode_blocks_vm_chunked(
            words, byte_lens, PARAMS, caps, chunk_steps=977, interpret=True
        )
        assert vmc.LANES == 8  # the decode switched back to the narrow width
        out, opos = np.asarray(out), np.asarray(opos)
        for f in dof._fields:
            assert not np.asarray(getattr(dof, f)).any(), f"overflow {f}"
        for i, b in enumerate(blocks):
            assert out[i, : opos[i]].tobytes() == b, f"block {i}"
    finally:
        vmc._enc_lanes_cached = old


def test_vm_engine_dispatch_roundtrip():
    """caps.engine='vm_interpret' routes encode_wave through the VM kernel
    (runtime._encode_one_device) and the result decodes on the XLA path."""
    from x3tpu.parallel import runtime

    caps = CodecCaps(
        dict_cap=512, pair_cap=1024, ctx_items_cap=128, ctx0_items_cap=128,
        ctx_small_cap=16, block_bytes=2048, engine="vm_interpret",
    )
    data = b"dispatch check: the quick brown fox " * 40
    blob = runtime.compress(data, PARAMS, block_bytes=1024, caps=caps)
    assert runtime.decompress(blob, PARAMS) == data


def test_vm_unsupported_configs():
    # dictionary beyond the VMEM budget (the huge-tier work lifted the cap
    # from 8192 to 32768/128-multiples, but 64K planes cannot fit)
    caps = CodecCaps(dict_cap=1 << 16, block_bytes=2048)
    with pytest.raises(VMUnsupported):
        _encode_vm([b"x"], PARAMS, caps)
    # non-128-multiple dictionary
    caps = CodecCaps(dict_cap=1000, block_bytes=2048)
    with pytest.raises(VMUnsupported):
        _encode_vm([b"x"], PARAMS, caps)
    # ctx item caps beyond the huge-span ceiling (8192/2048)
    caps = CodecCaps(dict_cap=1024, ctx_items_cap=16384, block_bytes=2048)
    with pytest.raises(VMUnsupported):
        _encode_vm([b"x"], PARAMS, caps)
    # big-window + big-dictionary: past the additive compile-size cliff
    # (hw_w32_bisect round 5: w32/d6144 compiles, w32/d8192 crashes the
    # compile service even on a healthy relay)
    caps = CodecCaps(dict_cap=8192, block_bytes=2048)
    with pytest.raises(VMUnsupported):
        _encode_vm([b"x"], X3Params(window=32 * 1024), caps)
    # blocks beyond the (round-5) 16 MiB text-class envelope
    caps = CodecCaps(dict_cap=1024, block_bytes=32 << 20)
    with pytest.raises(VMUnsupported):
        _encode_vm([b"x"], X3Params(window=1024), caps)
    # pair capacity beyond the VM ceiling must raise (NOT silently clamp:
    # a pairs-overflow retry doubles pair_cap and needs the XLA fallback)
    caps = CodecCaps(dict_cap=1024, pair_cap=1 << 21, block_bytes=2048)
    with pytest.raises(VMUnsupported):
        _encode_vm([b"x"], PARAMS, caps)


# ---------------------------------------------------------------------------
# Decoder kernel (kernel_dec.py)
# ---------------------------------------------------------------------------


def _pack_streams(streams):
    IW = max(1, max((len(s) + 3) // 4 for s in streams))
    words = np.zeros((len(streams), IW), "<u4")
    for i, s in enumerate(streams):
        pad = s + b"\x00" * (-len(s) % 4)
        words[i, : len(pad) // 4] = np.frombuffer(pad, "<u4")
    return words, np.array([len(s) for s in streams], np.int32)


@_subprocess_isolated
def test_vm_decoder_matches_spec():
    """VM decode of spec-encoded streams reproduces the input bytes and
    the reference event counters (decode twin of
    test_vm_encoder_matches_spec)."""
    from x3tpu.vm import decode_blocks_vm_chunked

    caps = CodecCaps(
        dict_cap=1024, pair_cap=2048, ctx_items_cap=128,
        ctx0_items_cap=128, ctx_small_cap=16, block_bytes=2048,
    )
    blocks = _blocks()
    words, byte_lens = _pack_streams([spec.encode(b, PARAMS) for b in blocks])
    out, opos, counts, sizes, of = decode_blocks_vm_chunked(
        words, byte_lens, PARAMS, caps, chunk_steps=977, interpret=True
    )
    out, opos = np.asarray(out), np.asarray(opos)
    for f in of._fields:
        assert not np.asarray(getattr(of, f)).any(), f"overflow {f}"
    for i, b in enumerate(blocks):
        assert out[i, : opos[i]].tobytes() == b, f"block {i} ({len(b)}B)"


@_subprocess_isolated
def test_vm_decoder_matches_xla_decoder():
    """VM and XLA decoders agree on output, counts, and sizes for
    VM-encoded streams (full VM round trip)."""
    import jax.numpy as jnp

    from x3tpu.vm import decode_blocks_vm_chunked

    caps = CodecCaps(
        dict_cap=1024, pair_cap=2048, ctx_items_cap=128,
        ctx0_items_cap=128, ctx_small_cap=16, block_bytes=2048,
    )
    blocks = _blocks()
    words, byte_lens, _, _, eof = _encode_vm(blocks, PARAMS, caps)
    for f in eof._fields:
        assert not np.asarray(getattr(eof, f)).any()
    vout, vpos, vcnt, vsz, vof = decode_blocks_vm_chunked(
        np.asarray(words), np.asarray(byte_lens), PARAMS, caps,
        interpret=True,
    )
    xout, xpos, xcnt, xsz, xof = codec.decode_blocks_chunked(
        jnp.asarray(words), jnp.asarray(byte_lens), PARAMS, caps
    )
    assert (np.asarray(vpos) == np.asarray(xpos)).all()
    assert (np.asarray(vout) == np.asarray(xout)).all()
    assert (np.asarray(vcnt) == np.asarray(xcnt)).all()
    np.testing.assert_allclose(
        np.asarray(vsz), np.asarray(xsz), rtol=1e-5, atol=1e-3
    )
    for i, b in enumerate(blocks):
        assert np.asarray(vout)[i, : np.asarray(vpos)[i]].tobytes() == b


@_subprocess_isolated
def test_vm_decoder_source_refill():
    """Streams longer than the resident source window (2*FLUSH_WORDS words
    = 2 KiB) force read-ahead refills; regression for the src_base handoff
    in the refill event (the AC reads of that event must use the shifted
    window's base, not the register value)."""
    from x3tpu.vm import decode_blocks_vm_chunked

    # pair_cap 8192: the random block's ~4.8K one-byte dictionary hits
    # each register a tag pair, overflowing a 4096 cap (correctly flagged)
    caps = CodecCaps(
        dict_cap=1024, pair_cap=8192, ctx_items_cap=128,
        ctx0_items_cap=128, ctx_small_cap=16, block_bytes=6144,
    )
    rng = np.random.default_rng(3)
    blocks = [
        rng.integers(0, 256, 6000, np.uint8).tobytes(),  # ~7 KB stream
        (b"the quick brown fox " * 300)[:6000],
    ]
    words, byte_lens = _pack_streams([spec.encode(b, PARAMS) for b in blocks])
    out, opos, _, _, of = decode_blocks_vm_chunked(
        words, byte_lens, PARAMS, caps, chunk_steps=4096, interpret=True
    )
    out, opos = np.asarray(out), np.asarray(opos)
    for f in of._fields:
        assert not np.asarray(getattr(of, f)).any(), f"overflow {f}"
    for i, b in enumerate(blocks):
        assert out[i, : opos[i]].tobytes() == b, f"block {i}"


@_subprocess_isolated
def test_vm_promoted_rows_gated_paths():
    """Data engineered so context rows outgrow the inline capacity (42/63
    items) and get promoted to big spans.  Asserts promotions actually
    happened by stepping the driver internals, then checks bit-exactness
    vs the spec oracle and a VM decode round trip."""
    import jax.numpy as jnp

    from x3tpu.vm import decode_blocks_vm_chunked
    from x3tpu.vm import driver as vmdrv
    from x3tpu.vm.config import R_PROMO0_N, R_PROMO1_N, vm_caps

    caps = CodecCaps(
        dict_cap=1024, pair_cap=8192, ctx_items_cap=256,
        ctx0_items_cap=256, ctx_small_cap=16, block_bytes=8192,
    )
    # random bytes over a 64-symbol alphabet: every symbol recurs ~128
    # times with up to 64 distinct random successors, so many NON-hub ctx1
    # rows outgrow the 42-item inline capacity and promote (hub contexts —
    # id 0 — never promote; an earlier construct only ever grew those)
    rng = np.random.default_rng(11)
    data = rng.integers(1, 65, 8192, np.uint8).tobytes()
    params = PARAMS
    vc = vm_caps(params, caps)
    text, tlen = codec.pack_blocks([data], params, caps)
    text_flat = vmdrv._prep_text(
        jnp.asarray(text, jnp.uint8), vc, 1, text.shape[1]
    )
    tlen_p = jnp.pad(jnp.asarray(tlen, jnp.int32), (0, 7))
    state = vmdrv._init_state(text_flat, tlen_p, vc, 1)
    step = vmdrv._get_step(vc, params, 4096, 1, True)
    while bool(vmdrv._any_active(state[13])):
        state = step(text_flat, *state)
    regs = np.asarray(state[13])
    assert regs[0, R_PROMO1_N] > 0 or regs[0, R_PROMO0_N] > 0, (
        "test data failed to trigger a promotion "
        f"(promo0={regs[0, R_PROMO0_N]}, promo1={regs[0, R_PROMO1_N]})"
    )
    words, byte_lens, counts, sizes, of = vmdrv._finalize(state, vc)
    words, byte_lens = np.asarray(words), np.asarray(byte_lens)
    for f in of._fields:
        assert not np.asarray(getattr(of, f))[0], f"overflow {f}"
    got = words[0].astype("<u4").tobytes()[: byte_lens[0]]
    assert got == spec.encode(data, params)

    out, opos, _, _, dof = decode_blocks_vm_chunked(
        words[:1], byte_lens[:1], params, caps, interpret=True
    )
    assert not any(np.asarray(getattr(dof, f))[0] for f in dof._fields)
    assert np.asarray(out)[0, : np.asarray(opos)[0]].tobytes() == data


@_subprocess_isolated
def test_vm_window_32k_small_block():
    """window=32K (the new VM upper limit, hardware-verified 2026-08-17)
    on a tiny block: the scan/extract machinery must mask the out-of-block
    window tail exactly like the spec does."""
    params = X3Params(max_match_count=15, window=32 * 1024)
    caps = CodecCaps(
        dict_cap=256, pair_cap=512, ctx_items_cap=128,
        ctx0_items_cap=128, ctx_small_cap=16, block_bytes=1024,
    )
    blocks = [
        b"abcabcabc 0123456789 " * 40,
        bytes(range(128)) * 2,
    ]
    words, byte_lens, counts, sizes, of = _encode_vm(blocks, params, caps)
    words, byte_lens = np.asarray(words), np.asarray(byte_lens)
    for f in of._fields:
        assert not np.asarray(getattr(of, f)).any(), f"overflow {f}"
    for i, b in enumerate(blocks):
        got = words[i].astype("<u4").tobytes()[: byte_lens[i]]
        assert got == spec.encode(b, params), f"block {i}"


def test_vm_chunked_scan_bit_exact():
    """The loop-over-chunks window scan (VMCaps.scan_chunk; compiled in
    at window > 8 KiB where the flat scan's full unroll crashed the
    relay compile helper, kernel.py ph_probe_scan) must be
    stream-identical to the flat scan AND to the spec.  Run at a small
    window with the chunk width forced tiny so 8 chunks (incl. the
    masked tail chunk) are exercised cheaply in interpret mode; the
    derived threshold is covered by test_vm_window_32k_small_block,
    which now takes the chunked path at its real window."""
    import dataclasses

    from x3tpu.vm.config import vm_caps

    params = X3Params(max_match_count=4, window=2048)
    caps = CodecCaps(
        dict_cap=512, pair_cap=2048, ctx_items_cap=128,
        ctx0_items_cap=128, ctx_small_cap=16, block_bytes=2048,
    )
    vc0 = vm_caps(params, caps)
    assert vc0.scan_chunk == 0  # default window stays on the flat scan
    vc = dataclasses.replace(vc0, scan_chunk=256)
    rng = np.random.default_rng(7)
    blocks = [
        b"abcabcabc 0123456789 " * 90,              # window matches
        (b"the quick brown fox " * 120)[:2048],
        rng.integers(0, 256, 2048, np.uint8).tobytes(),  # runs die fast
        (b"x" * 200 + b"abc") * 9,                  # long runs deep scan
    ]
    text, tlen = codec.pack_blocks(blocks, params, caps)
    words, byte_lens, counts, sizes, of = encode_blocks_vm_chunked(
        text, tlen, params, caps, chunk_steps=4096, interpret=True, vc=vc
    )
    words = np.asarray(words)
    byte_lens = np.asarray(byte_lens)
    for f in of._fields:
        assert not np.asarray(getattr(of, f)).any(), f"overflow {f}"
    for i, b in enumerate(blocks):
        got = words[i].astype("<u4").tobytes()[: byte_lens[i]]
        assert got == spec.encode(b, params), f"block {i}"


def _huge_tier_data():
    """Input engineered so one non-hub ctx1 row and one ctx0 row collect
    ~230 distinct successor tags.  window=32 makes SCAN <= 0 (no window
    matcher), so after the single-byte prelude every event is a dict hit:
    each round ``X Y ci`` appends ci to ctx1[Y] and to ctx0[(X,Y)]."""
    pre = bytes(range(1, 251))
    X, Y = 251, 252
    body = b"".join(bytes([X, Y, c]) for c in range(1, 231))
    return pre + body


@_subprocess_isolated
def test_vm_huge_rows_bit_exact():
    """Rows past the big-span capacity promote to HUGE spans (the 4 MB
    block regime: /tmp/ref4mb.log measured ctx1 rows to 7449 items).  The
    test lowers the promotion trigger (big_trig*, layout-internal — the
    stream is unaffected) so ~230-item rows exercise the tier, asserts
    huge promotions actually happened in BOTH families, and checks
    bit-exactness vs the spec oracle plus a VM decode round trip."""
    import dataclasses

    import jax.numpy as jnp

    from x3tpu.vm import driver as vmdrv
    from x3tpu.vm.config import R_HUGE0_N, R_HUGE1_N, vm_caps

    params = X3Params(max_match_count=15, window=32)
    caps = CodecCaps(
        dict_cap=384, pair_cap=2048, ctx_items_cap=1024,
        ctx0_items_cap=1024, ctx_small_cap=16, block_bytes=1024,
    )
    data = _huge_tier_data()
    vc = vm_caps(params, caps)
    assert vc.nr2_1 == 8 and vc.nr2_0 == 8 and vc.dict_cap == 384
    vc = dataclasses.replace(vc, big_trig0=200, big_trig1=160)

    text, tlen = codec.pack_blocks([data], params, caps)
    text_flat = vmdrv._prep_text(
        jnp.asarray(text, jnp.uint8), vc, 1, text.shape[1]
    )
    tlen_p = jnp.pad(jnp.asarray(tlen, jnp.int32), (0, 7))
    state = vmdrv._init_state(text_flat, tlen_p, vc, 1)
    step = vmdrv._get_step(vc, params, 4096, 1, True)
    while bool(vmdrv._any_active(state[13])):
        state = step(text_flat, *state)
    regs = np.asarray(state[13])
    assert regs[0, R_HUGE1_N] > 0, "no ctx1 huge promotion"
    assert regs[0, R_HUGE0_N] > 0, "no ctx0 huge promotion"
    words, byte_lens, counts, sizes, of = vmdrv._finalize(state, vc)
    words, byte_lens = np.asarray(words), np.asarray(byte_lens)
    for f in of._fields:
        assert not np.asarray(getattr(of, f))[0], f"overflow {f}"
    got = words[0].astype("<u4").tobytes()[: byte_lens[0]]
    assert got == spec.encode(data, params)

    out, opos, _, _, dof = vmdrv.decode_blocks_vm_chunked(
        words[:1], byte_lens[:1], params, caps, vc=vc, interpret=True
    )
    assert not any(np.asarray(getattr(dof, f))[0] for f in dof._fields)
    assert np.asarray(out)[0, : np.asarray(opos)[0]].tobytes() == data


@_subprocess_isolated
def test_vm_huge_wide_sections_bit_exact():
    """nr2_0 in the newly-allowed 17..32 range (round 5: the 8-16 MiB
    text regime needs ctx0 huge spans of 20 sections, measured max 2506
    items at 16 MiB).  Same lowered-trigger recipe as
    test_vm_huge_rows_bit_exact, but with 2560-item caps so BOTH
    families compile 20-section spans."""
    import dataclasses

    import jax.numpy as jnp

    from x3tpu.vm import driver as vmdrv
    from x3tpu.vm.config import R_HUGE0_N, R_HUGE1_N, vm_caps

    params = X3Params(max_match_count=15, window=32)
    caps = CodecCaps(
        dict_cap=384, pair_cap=2048, ctx_items_cap=2560,
        ctx0_items_cap=2560, ctx_small_cap=16, block_bytes=1024,
    )
    data = _huge_tier_data()
    vc = vm_caps(params, caps)
    assert vc.nr2_1 == 20 and vc.nr2_0 == 20
    vc = dataclasses.replace(vc, big_trig0=200, big_trig1=160)

    text, tlen = codec.pack_blocks([data], params, caps)
    text_flat = vmdrv._prep_text(
        jnp.asarray(text, jnp.uint8), vc, 1, text.shape[1]
    )
    tlen_p = jnp.pad(jnp.asarray(tlen, jnp.int32), (0, 7))
    state = vmdrv._init_state(text_flat, tlen_p, vc, 1)
    step = vmdrv._get_step(vc, params, 4096, 1, True)
    while bool(vmdrv._any_active(state[13])):
        state = step(text_flat, *state)
    regs = np.asarray(state[13])
    assert regs[0, R_HUGE1_N] > 0, "no ctx1 huge promotion"
    assert regs[0, R_HUGE0_N] > 0, "no ctx0 huge promotion"
    words, byte_lens, counts, sizes, of = vmdrv._finalize(state, vc)
    words, byte_lens = np.asarray(words), np.asarray(byte_lens)
    for f in of._fields:
        assert not np.asarray(getattr(of, f))[0], f"overflow {f}"
    got = words[0].astype("<u4").tobytes()[: byte_lens[0]]
    assert got == spec.encode(data, params)

    out, opos, _, _, dof = vmdrv.decode_blocks_vm_chunked(
        words[:1], byte_lens[:1], params, caps, vc=vc, interpret=True
    )
    assert not any(np.asarray(getattr(dof, f))[0] for f in dof._fields)
    assert np.asarray(out)[0, : np.asarray(opos)[0]].tobytes() == data


@_subprocess_isolated
def test_vm_huge_prev_priming_across_launches():
    """chunk_steps smaller than the event count forces many launches, so
    the pre-loop prev-row priming runs with HUGE prev rows (the in-loop
    path never fetches prev from HBM — only the launch boundary does).
    The stream must be invariant to chunking, and decode likewise."""
    import dataclasses

    import jax.numpy as jnp

    from x3tpu.vm import driver as vmdrv
    from x3tpu.vm.config import vm_caps

    params = X3Params(max_match_count=15, window=32)
    caps = CodecCaps(
        dict_cap=384, pair_cap=2048, ctx_items_cap=1024,
        ctx0_items_cap=1024, ctx_small_cap=16, block_bytes=1024,
    )
    data = _huge_tier_data()
    vc = dataclasses.replace(vm_caps(params, caps),
                             big_trig0=200, big_trig1=160)

    text, tlen = codec.pack_blocks([data], params, caps)
    text_flat = vmdrv._prep_text(
        jnp.asarray(text, jnp.uint8), vc, 1, text.shape[1]
    )
    tlen_p = jnp.pad(jnp.asarray(tlen, jnp.int32), (0, 7))
    state = vmdrv._init_state(text_flat, tlen_p, vc, 1)
    step = vmdrv._get_step(vc, params, 64, 1, True)
    launches = 0
    while bool(vmdrv._any_active(state[13])):
        state = step(text_flat, *state)
        launches += 1
    assert launches > 10, f"expected many launches, got {launches}"
    words, byte_lens, _, _, of = vmdrv._finalize(state, vc)
    words, byte_lens = np.asarray(words), np.asarray(byte_lens)
    for f in of._fields:
        assert not np.asarray(getattr(of, f))[0], f"overflow {f}"
    got = words[0].astype("<u4").tobytes()[: byte_lens[0]]
    assert got == spec.encode(data, params)

    out, opos, _, _, dof = vmdrv.decode_blocks_vm_chunked(
        words[:1], byte_lens[:1], params, caps, vc=vc, interpret=True,
        chunk_steps=64,
    )
    assert not any(np.asarray(getattr(dof, f))[0] for f in dof._fields)
    assert np.asarray(out)[0, : np.asarray(opos)[0]].tobytes() == data


@pytest.mark.skipif(not os.environ.get("X3TPU_SLOW"),
                    reason="randomized interpret-mode runs are slow")
@_subprocess_isolated
def test_vm_huge_fuzz_vs_spec():
    """Randomized differential for the huge tier: low promotion triggers
    (just past the inline capacities) make random data drive MANY rows
    through big->huge promotion, in both window regimes (no-scan and
    scan-active).  Streams must match the spec oracle bit-for-bit and VM
    decode must round-trip."""
    import dataclasses

    import jax.numpy as jnp

    from x3tpu.vm import driver as vmdrv
    from x3tpu.vm.config import R_HUGE1_N, vm_caps

    caps = CodecCaps(
        dict_cap=512, pair_cap=4096, ctx_items_cap=1024,
        ctx0_items_cap=1024, ctx_small_cap=16, block_bytes=8192,
    )
    # alphabet 64, ~6 KB: each tag recurs ~90 times with ~50 distinct
    # random successors, so many NON-hub ctx1 rows pass the lowered
    # trigger (ctx0 rows stay shallow — pair recurrence ~1.5 — so fam0
    # huge coverage stays with the engineered test)
    rng = np.random.default_rng(23)
    for window in (32, 256):
        params = X3Params(max_match_count=15, window=window)
        vc = dataclasses.replace(vm_caps(params, caps),
                                 big_trig0=72, big_trig1=48)
        data = rng.integers(1, 65, 6000, np.uint8).tobytes()
        text, tlen = codec.pack_blocks([data], params, caps)
        text_flat = vmdrv._prep_text(
            jnp.asarray(text, jnp.uint8), vc, 1, text.shape[1]
        )
        tlen_p = jnp.pad(jnp.asarray(tlen, jnp.int32), (0, 7))
        state = vmdrv._init_state(text_flat, tlen_p, vc, 1)
        step = vmdrv._get_step(vc, params, 4096, 1, True)
        while bool(vmdrv._any_active(state[13])):
            state = step(text_flat, *state)
        regs = np.asarray(state[13])
        assert regs[0, R_HUGE1_N] > 0, f"w={window}: no huge promotion"
        words, byte_lens, _, _, of = vmdrv._finalize(state, vc)
        words, byte_lens = np.asarray(words), np.asarray(byte_lens)
        for f in of._fields:
            assert not np.asarray(getattr(of, f))[0], f"overflow {f}"
        got = words[0].astype("<u4").tobytes()[: byte_lens[0]]
        assert got == spec.encode(data, params), f"w={window} mismatch"

        out, opos, _, _, dof = vmdrv.decode_blocks_vm_chunked(
            words[:1], byte_lens[:1], params, caps, vc=vc, interpret=True
        )
        assert not any(np.asarray(getattr(dof, f))[0] for f in dof._fields)
        assert np.asarray(out)[0, : np.asarray(opos)[0]].tobytes() == data


@pytest.mark.skipif(not os.environ.get("X3TPU_SLOW"),
                    reason="2-group interpret run is slow")
@_subprocess_isolated
def test_vm_huge_two_groups():
    """9 blocks -> G=2 grid: huge-span HBM addressing must be correct for
    the second lane-group (lane_rowbase includes the group index)."""
    import dataclasses

    import jax.numpy as jnp

    from x3tpu.vm import driver as vmdrv
    from x3tpu.vm.config import R_HUGE1_N, vm_caps

    params = X3Params(max_match_count=15, window=32)
    caps = CodecCaps(
        dict_cap=384, pair_cap=2048, ctx_items_cap=1024,
        ctx0_items_cap=1024, ctx_small_cap=16, block_bytes=1024,
    )
    data = _huge_tier_data()
    blocks = [data] * 9
    vc = dataclasses.replace(vm_caps(params, caps),
                             big_trig0=200, big_trig1=160)
    text, tlen = codec.pack_blocks(blocks, params, caps)
    G = 2
    text_flat = vmdrv._prep_text(
        jnp.asarray(text, jnp.uint8), vc, G, text.shape[1]
    )
    tlen_p = jnp.pad(jnp.asarray(tlen, jnp.int32), (0, G * 8 - len(blocks)))
    state = vmdrv._init_state(text_flat, tlen_p, vc, G)
    step = vmdrv._get_step(vc, params, 4096, G, True)
    while bool(vmdrv._any_active(state[13])):
        state = step(text_flat, *state)
    regs = np.asarray(state[13])
    assert (regs[: len(blocks), R_HUGE1_N] > 0).all()
    words, byte_lens, _, _, of = vmdrv._finalize(state, vc)
    words, byte_lens = np.asarray(words), np.asarray(byte_lens)
    want = spec.encode(data, params)
    for i in range(len(blocks)):
        for f in of._fields:
            assert not np.asarray(getattr(of, f))[i], f"overflow {f} lane {i}"
        got = words[i].astype("<u4").tobytes()[: byte_lens[i]]
        assert got == want, f"lane {i} mismatch"


@_subprocess_isolated
def test_vm_seeded_dictionary_matches_xla():
    """Dictionary-seed broadcast (x3tpu extension; runtime.seeds_to_arrays)
    is pure state init, so the VM must produce the exact XLA-path stream
    and decode it back, with NO fallback."""
    import jax.numpy as jnp

    from x3tpu.parallel.runtime import seeds_to_arrays
    from x3tpu.vm import decode_blocks_vm_chunked

    caps = CodecCaps(
        dict_cap=512, pair_cap=1024, ctx_items_cap=128, ctx0_items_cap=128,
        ctx_small_cap=16, block_bytes=2048,
    )
    seed_bytes = [b"abracadabra ", b"the quick ", b"fox", b"\x00\x01\x02"]
    seeds = tuple(jnp.asarray(a) for a in seeds_to_arrays(seed_bytes))
    blocks = [b"abracadabra abracadabra the quick fox " * 12,
              b"no seed overlap here: 123456789 " * 10]
    text, tlen = codec.pack_blocks(blocks, PARAMS, caps)
    vw, vl, vcnt, _, vof = encode_blocks_vm_chunked(
        text, tlen, PARAMS, caps, seeds=seeds, interpret=True
    )
    xw, xl, xcnt, _, xof = codec.encode_blocks_chunked(
        jnp.asarray(text), jnp.asarray(tlen), PARAMS, caps, seeds=seeds
    )
    vw, vl, xw, xl = map(np.asarray, (vw, vl, xw, xl))
    for f in vof._fields:
        assert not np.asarray(getattr(vof, f)).any()
        assert not np.asarray(getattr(xof, f)).any()
    for i in range(len(blocks)):
        got = vw[i].astype("<u4").tobytes()[: vl[i]]
        want = xw[i].astype("<u4").tobytes()[: xl[i]]
        assert got == want, f"lane {i} seeded stream mismatch"
        assert (np.asarray(vcnt)[i] == np.asarray(xcnt)[i]).all()
    # seeded streams need seeded decode
    out, opos, _, _, dof = decode_blocks_vm_chunked(
        vw[: len(blocks)], vl[: len(blocks)], PARAMS, caps, seeds=seeds,
        interpret=True,
    )
    assert not any(np.asarray(getattr(dof, f)).any() for f in dof._fields)
    for i, b in enumerate(blocks):
        assert np.asarray(out)[i, : np.asarray(opos)[i]].tobytes() == b


@_subprocess_isolated
def test_vm_huge_asymmetric_families():
    """ctx1 huge tier on, ctx0 huge tier OFF (nr2_0 == 0): the kernels
    must compile the mixed configuration and stay bit-exact (ctx0 rows
    stop at the big tier)."""
    import dataclasses

    import jax.numpy as jnp

    from x3tpu.vm import driver as vmdrv
    from x3tpu.vm.config import R_HUGE0_N, R_HUGE1_N, vm_caps

    params = X3Params(max_match_count=15, window=32)
    caps = CodecCaps(
        dict_cap=384, pair_cap=2048, ctx_items_cap=1024,
        ctx0_items_cap=512, ctx_small_cap=16, block_bytes=1024,
    )
    data = _huge_tier_data()
    vc = vm_caps(params, caps)
    assert vc.nr2_1 == 8 and vc.nr2_0 == 0
    vc = dataclasses.replace(vc, big_trig1=160)

    text, tlen = codec.pack_blocks([data], params, caps)
    text_flat = vmdrv._prep_text(
        jnp.asarray(text, jnp.uint8), vc, 1, text.shape[1]
    )
    tlen_p = jnp.pad(jnp.asarray(tlen, jnp.int32), (0, 7))
    state = vmdrv._init_state(text_flat, tlen_p, vc, 1)
    step = vmdrv._get_step(vc, params, 4096, 1, True)
    while bool(vmdrv._any_active(state[13])):
        state = step(text_flat, *state)
    regs = np.asarray(state[13])
    assert regs[0, R_HUGE1_N] > 0 and regs[0, R_HUGE0_N] == 0
    words, byte_lens, _, _, of = vmdrv._finalize(state, vc)
    words, byte_lens = np.asarray(words), np.asarray(byte_lens)
    for f in of._fields:
        assert not np.asarray(getattr(of, f))[0], f"overflow {f}"
    got = words[0].astype("<u4").tobytes()[: byte_lens[0]]
    assert got == spec.encode(data, params)

    out, opos, _, _, dof = vmdrv.decode_blocks_vm_chunked(
        words[:1], byte_lens[:1], params, caps, vc=vc, interpret=True
    )
    assert not any(np.asarray(getattr(dof, f))[0] for f in dof._fields)
    assert np.asarray(out)[0, : np.asarray(opos)[0]].tobytes() == data


@_subprocess_isolated
def test_vm_sharded_mesh_bit_exact():
    """Mesh-sharded VM drivers (shard_map over the 8-device CPU test
    mesh): per-device Pallas grids, no cross-device sync inside a launch.
    Streams must match the spec oracle and the runtime dispatch must pick
    the VM path (engine='vm_interpret' + mesh)."""
    from x3tpu.parallel import mesh as meshmod
    from x3tpu.parallel import runtime
    from x3tpu.vm import decode_blocks_vm_sharded, encode_blocks_vm_sharded

    caps = CodecCaps(
        dict_cap=512, pair_cap=1024, ctx_items_cap=128, ctx0_items_cap=128,
        ctx_small_cap=16, block_bytes=2048,
    )
    blocks = _blocks() + [b"mesh lane %d " % i * 30 for i in range(6)]
    mesh = meshmod.make_mesh()
    assert mesh.devices.size == 8
    text, tlen = codec.pack_blocks(blocks, PARAMS, caps)
    words, byte_lens, counts, sizes, of = encode_blocks_vm_sharded(
        text, tlen, PARAMS, caps, mesh, chunk_steps=977, interpret=True
    )
    words, byte_lens = np.asarray(words), np.asarray(byte_lens)
    for f in of._fields:
        assert not np.asarray(getattr(of, f)).any(), f"overflow {f}"
    for i, b in enumerate(blocks):
        got = words[i].astype("<u4").tobytes()[: byte_lens[i]]
        assert got == spec.encode(b, PARAMS), f"block {i} ({len(b)}B)"

    out, opos, _, _, dof = decode_blocks_vm_sharded(
        words[: len(blocks)], byte_lens[: len(blocks)], PARAMS, caps, mesh,
        chunk_steps=977, interpret=True,
    )
    assert not any(np.asarray(getattr(dof, f)).any() for f in dof._fields)
    for i, b in enumerate(blocks):
        assert np.asarray(out)[i, : np.asarray(opos)[i]].tobytes() == b

    # the runtime wave dispatch must route mesh+vm_interpret through the
    # VM sharded drivers (no VMUnsupported fallback at these caps)
    caps_vm = CodecCaps(
        dict_cap=512, pair_cap=1024, ctx_items_cap=128, ctx0_items_cap=128,
        ctx_small_cap=16, block_bytes=2048, engine="vm_interpret",
    )
    res = runtime.encode_wave(blocks, PARAMS, caps_vm, mesh=mesh)
    for i, b in enumerate(blocks):
        assert res.payloads[i] == spec.encode(b, PARAMS), f"wave block {i}"


@_subprocess_isolated
def test_vm_overflow_subset_when_rows_exceed_caps():
    """Rows that exceed ctx_items_cap but fit the VM's STRUCTURAL tier
    capacities (inline 42/63 -> big 640/896 -> huge nr2*128): the XLA
    path flags overflow at the cap, the VM only at real storage limits —
    so VM-flagged lanes are a SUBSET of XLA-flagged lanes, and every lane
    the VM completes is still spec-exact (capacity never shapes the
    stream, only whether state fits; the reference grows unboundedly)."""
    import jax.numpy as jnp

    caps = CodecCaps(
        dict_cap=512, pair_cap=8192, ctx_items_cap=48,
        ctx0_items_cap=64, ctx_small_cap=16, block_bytes=8192,
    )
    rng = np.random.default_rng(11)
    data = rng.integers(1, 65, 8192, np.uint8).tobytes()
    params = X3Params(max_match_count=4, window=256)
    text, tlen = codec.pack_blocks([data], params, caps)
    vw, vl, _, _, vof = encode_blocks_vm_chunked(
        text, tlen, params, caps, interpret=True
    )
    xw, xl, _, _, xof = codec.encode_blocks_chunked(
        jnp.asarray(text), jnp.asarray(tlen), params, caps
    )
    v_any = any(bool(np.asarray(getattr(vof, f))[0]) for f in vof._fields)
    x_any = any(bool(np.asarray(getattr(xof, f))[0]) for f in xof._fields)
    # the XLA path must overflow here (rows pass 48 items); the VM holds
    # them in its big spans and must complete
    assert x_any and not v_any, (v_any, x_any)
    got = np.asarray(vw)[0].astype("<u4").tobytes()[: np.asarray(vl)[0]]
    assert got == spec.encode(data, params)


@_subprocess_isolated
def test_vm_sub_batched_bit_exact():
    """The SB-sub-batch kernel layout (kernel.py: SB x 8 lanes per grid
    step, separate per-sub-batch state, phase-major emission) is pure
    layout: streams must be byte-identical to the spec oracle at every
    SB, including a lane count that pads the last sub-batch."""
    from x3tpu.vm import decode_blocks_vm_chunked
    from x3tpu.vm.driver import encode_blocks_vm_chunked as enc

    caps = CodecCaps(
        dict_cap=512, pair_cap=1024, ctx_items_cap=128,
        ctx0_items_cap=128, ctx_small_cap=16, block_bytes=2048,
    )
    golden = (GOLDEN / "text_small.bin").read_bytes()
    rng = np.random.default_rng(11)
    blocks = [golden[i * 97 : i * 97 + 900] for i in range(10)]
    blocks += [rng.integers(0, 256, 300, np.uint8).tobytes(), b""]
    text, tlen = codec.pack_blocks(blocks, PARAMS, caps)
    want = [spec.encode(b, PARAMS) for b in blocks]

    for subs in (2, 4):
        vw, vl, _, _, of = enc(
            text, tlen, PARAMS, caps, chunk_steps=600, interpret=True,
            subs=subs,
        )
        vw, vl = np.asarray(vw), np.asarray(vl)
        for f in of._fields:
            assert not np.asarray(getattr(of, f)).any(), (subs, f)
        for i in range(len(blocks)):
            got = vw[i].astype("<u4").tobytes()[: vl[i]]
            assert got == want[i], f"subs={subs} lane {i}"

        iw = (int(vl.max()) + 3) // 4 + 2
        out, opos, _, _, dof = decode_blocks_vm_chunked(
            vw[:, :iw], vl, PARAMS, caps, chunk_steps=600, interpret=True,
            subs=subs,
        )
        out, opos = np.asarray(out), np.asarray(opos)
        for i, b in enumerate(blocks):
            assert bytes(out[i][: opos[i]]) == b, f"subs={subs} dec {i}"


@_subprocess_isolated
def test_vm_sub_batched_sharded_mesh():
    """Sub-batched VM kernels under shard_map on the 8-device CPU mesh:
    per-device grids of SB x 8 lanes, streams bit-exact vs the oracle."""
    from x3tpu.parallel import mesh as meshmod
    from x3tpu.vm import decode_blocks_vm_sharded, encode_blocks_vm_sharded

    caps = CodecCaps(
        dict_cap=256, pair_cap=512, ctx_items_cap=64,
        ctx0_items_cap=64, ctx_small_cap=16, block_bytes=1024,
    )
    mesh = meshmod.make_mesh()
    nd = mesh.devices.size
    golden = (GOLDEN / "text_small.bin").read_bytes()
    # 16 lanes/device -> pick_subs would choose 2; force subs=2 explicitly
    blocks = [golden[i * 37 : i * 37 + 500] for i in range(16 * nd)]
    text, tlen = codec.pack_blocks(blocks, PARAMS, caps)
    vw, vl, _, _, of = encode_blocks_vm_sharded(
        text, tlen, PARAMS, caps, mesh, chunk_steps=600, interpret=True,
        subs=2,
    )
    vw, vl = np.asarray(vw), np.asarray(vl)
    for f in of._fields:
        assert not np.asarray(getattr(of, f)).any(), f
    for i, b in enumerate(blocks):
        got = vw[i].astype("<u4").tobytes()[: vl[i]]
        assert got == spec.encode(b, PARAMS), f"lane {i}"
    iw = (int(vl.max()) + 3) // 4 + 2
    out, opos, _, _, _ = decode_blocks_vm_sharded(
        vw[:, :iw], vl, PARAMS, caps, mesh, chunk_steps=600,
        interpret=True, subs=2,
    )
    out, opos = np.asarray(out), np.asarray(opos)
    for i, b in enumerate(blocks):
        assert bytes(out[i][: opos[i]]) == b, f"dec {i}"


def test_vm_gated_probe_bit_exact():
    """The tiered dictionary probe (vc.probe_gate: words 0-1 dense, words
    2-7 under the any-long-entry-alive gate; kernel.py ph_probe_scan /
    ph_sweep, kernel_dec.py dup probe) must be stream-identical to the
    dense probe.  The corpus drives BOTH gate outcomes: long repeated
    fragments insert > 8-byte dictionary entries that later 8-byte-match
    (gate fires), interleaved with short/random text (gate idle).  Run
    at a small D with probe_gate forced on so the interpret compile
    stays cheap; the derived threshold (D >= 4096) is covered by the
    real-capacity tests."""
    import dataclasses

    from x3tpu.vm import decode_blocks_vm_chunked
    from x3tpu.vm.config import vm_caps

    params = X3Params(max_match_count=4, window=256)
    caps = CodecCaps(
        dict_cap=512, pair_cap=2048, ctx_items_cap=128,
        ctx0_items_cap=128, ctx_small_cap=16, block_bytes=4096,
    )
    vc = dataclasses.replace(vm_caps(params, caps), probe_gate=True)
    rng = np.random.default_rng(11)
    long_frag = b"abcdefghijklmnopqrstuvwxyz0123456"  # 33B -> 32B entries
    blocks = [
        (long_frag + b"-%04d-" % 7 + long_frag) * 30,      # long matches
        b"the quick brown fox jumps over the lazy dog. " * 40,
        rng.integers(0, 256, 1500, np.uint8).tobytes(),    # gate idle
        (long_frag[:12] + b"##") * 100,                    # 9-12B entries
    ]
    text, tlen = codec.pack_blocks(blocks, params, caps)
    words, byte_lens, counts, sizes, of = encode_blocks_vm_chunked(
        text, tlen, params, caps, chunk_steps=4096, interpret=True, vc=vc
    )
    words = np.asarray(words)
    byte_lens = np.asarray(byte_lens)
    for f in of._fields:
        assert not np.asarray(getattr(of, f)).any(), f"overflow {f}"
    payloads = []
    for i, b in enumerate(blocks):
        got = words[i].astype("<u4").tobytes()[: byte_lens[i]]
        assert got == spec.encode(b, params), f"block {i} ({len(b)}B)"
        payloads.append(got)

    # decode direction (gated dup probe) round-trips the same streams
    iw = max((len(s) + 3) // 4 for s in payloads) + 2
    wsrc = np.zeros((len(payloads), iw), np.uint32)
    lens = np.zeros((len(payloads),), np.int32)
    for i, s in enumerate(payloads):
        arr = np.frombuffer(s + b"\x00" * ((-len(s)) % 4), "<u4")
        wsrc[i, : len(arr)] = arr
        lens[i] = len(s)
    out, opos, *_ = decode_blocks_vm_chunked(
        wsrc, lens, params, caps, chunk_steps=4096, interpret=True, vc=vc
    )
    out = np.asarray(out)
    opos = np.asarray(opos)
    for i, b in enumerate(blocks):
        assert out[i, : opos[i]].tobytes() == b, f"decode block {i}"
