"""Differential tests: the lane-batched JAX codec vs the spec oracle and
vs reference golden streams."""

import numpy as np
import pytest

from x3tpu import codec, spec
from x3tpu.config import CodecCaps, X3Params

from conftest import GOLDEN, PARAMSETS, golden_cases

SMALL_CAPS = CodecCaps(
    dict_cap=1 << 10,
    pair_cap=1 << 13,
    ctx_items_cap=192,
    block_bytes=1 << 15,
)
SMALL_PARAMS = X3Params(max_match_count=4, window=1024)


def _inputs():
    return [
        b"",
        b"A",
        b"abracadabra " * 40,
        bytes(range(256)) * 3,
        np.random.default_rng(0).integers(0, 256, 1500, dtype=np.uint8).tobytes(),
        (GOLDEN / "text_small.bin").read_bytes(),
    ]


def test_encode_matches_spec_batch():
    """All inputs encoded in ONE lane batch must equal per-input spec
    streams bit-for-bit."""
    blocks = _inputs()
    ours = codec.encode_blocks(blocks, SMALL_PARAMS, SMALL_CAPS)
    for i, b in enumerate(blocks):
        want = spec.encode(b, SMALL_PARAMS)
        assert ours[i] == want, f"block {i} ({len(b)}B): {len(ours[i])} vs {len(want)}"


def test_decode_matches_spec_batch():
    blocks = _inputs()
    streams = [spec.encode(b, SMALL_PARAMS) for b in blocks]
    outs = codec.decode_blocks(streams, SMALL_PARAMS, SMALL_CAPS)
    for i, b in enumerate(blocks):
        assert outs[i] == b, f"block {i}"


def test_decode_counts_match_encode_counts():
    """Event counters agree between encode and decode of the same data
    (the reference never counts E_EOF in events[], either direction)."""
    import jax.numpy as jnp

    from x3tpu.config import E_EOF

    blocks = _inputs()
    text, tlen = codec.pack_blocks(blocks, SMALL_PARAMS, SMALL_CAPS)
    w, l, enc_counts, _, _ = codec.encode_blocks_chunked(
        jnp.asarray(text), jnp.asarray(tlen), SMALL_PARAMS, SMALL_CAPS
    )
    _, _, dec_counts, _, _ = codec.decode_blocks_chunked(
        w, l, SMALL_PARAMS, SMALL_CAPS
    )
    np.testing.assert_array_equal(np.asarray(enc_counts),
                                  np.asarray(dec_counts))
    assert not np.asarray(enc_counts)[:, E_EOF].any()


def test_roundtrip_high_ratio():
    # >64:1 ratio input (crashes the reference decoder; ours must not)
    data = b"\x00" * 8192
    [stream] = codec.encode_blocks([data], SMALL_PARAMS, SMALL_CAPS)
    [out] = codec.decode_blocks([stream], SMALL_PARAMS, SMALL_CAPS)
    assert out == data


@pytest.mark.parametrize("name,pname", [c for c in golden_cases() if c[1] == "t4_w1"])
def test_golden_bit_exact(name, pname):
    """Encode matches the reference binary's stream; decode consumes it."""
    data = (GOLDEN / f"{name}.bin").read_bytes()
    golden = (GOLDEN / f"{name}.{pname}.x3").read_bytes()
    params = X3Params(**PARAMSETS[pname])
    [ours] = codec.encode_blocks([data], params, SMALL_CAPS)
    assert ours == golden, f"{name}: {len(ours)} vs {len(golden)}"
    [out] = codec.decode_blocks([golden], params, SMALL_CAPS)
    assert out == data


def test_nl_remap_and_factors():
    """-x remap and magic-factor paths against the spec."""
    data = (GOLDEN / "text_tiny.bin").read_bytes()
    for pname in ("t2_w1_x", "t8_w2_m0"):
        params = X3Params(**PARAMSETS[pname])
        [ours] = codec.encode_blocks([data], params, SMALL_CAPS)
        want = spec.encode(data, params)
        assert ours == want, pname


def test_capacity_overflow_raises():
    caps = CodecCaps(dict_cap=4, pair_cap=8, ctx_items_cap=4, block_bytes=4096)
    data = (GOLDEN / "text_tiny.bin").read_bytes()
    with pytest.raises(codec.X3CapacityError):
        codec.encode_blocks([data], SMALL_PARAMS, caps)


def test_pair_overflow_exact_boundary():
    """Regression (round-1 verdict): the pair-capacity flag must fire for
    the first id that cannot have its own row — and not before.  Pair ids
    run 0..S (0 = hub); the sticky flag fires one early, when the id about
    to be assigned is the last representable one, so pair_cap == npairs is
    the exact overflow-free minimum."""
    from x3tpu import host
    from x3tpu.parallel.runtime import encode_wave

    data = (GOLDEN / "text_small.bin").read_bytes()[:4096]
    npairs = host.measure_state(data, SMALL_PARAMS)["pairs"]
    assert npairs > 8, "fixture too small to exercise the boundary"
    base = dict(dict_cap=1 << 10, ctx_items_cap=64, block_bytes=1 << 13)
    want = spec.encode(data, SMALL_PARAMS)

    ok_caps = CodecCaps(pair_cap=npairs, **base)
    [stream] = codec.encode_blocks([data], SMALL_PARAMS, ok_caps)
    assert stream == want

    bad_caps = CodecCaps(pair_cap=npairs - 1, **base)
    with pytest.raises(codec.X3CapacityError) as ei:
        codec.encode_blocks([data], SMALL_PARAMS, bad_caps)
    assert "pairs" in ei.value.flags

    # the wave runtime's capacity auto-retry recovers bit-exact output
    res = encode_wave([data], SMALL_PARAMS, bad_caps)
    assert res.payloads[0] == want


def test_decode_write_at_buffer_edge():
    """Regression: a fragment write that exactly reaches the output-buffer
    end must not lose its last byte (scatter duplicate-index clipping)."""
    caps = CodecCaps(dict_cap=256, pair_cap=1024, ctx_items_cap=64,
                     block_bytes=1024)
    data = (b"edge case payload " * 64)[:1024]  # fills the buffer exactly
    [stream] = codec.encode_blocks([data], SMALL_PARAMS, caps)
    [out] = codec.decode_blocks([stream], SMALL_PARAMS, caps)
    assert out == data


def test_chunked_matches_whole_loop():
    """Chunked host driver (bounded device programs, donated carry) produces
    bit-identical streams to the whole-loop path."""
    import jax.numpy as jnp

    blocks = _inputs()[:4]
    text, tlen = codec.pack_blocks(blocks, SMALL_PARAMS, SMALL_CAPS)
    w1, l1, _, _, _ = codec.encode_blocks_jit(
        jnp.asarray(text), jnp.asarray(tlen), SMALL_PARAMS, SMALL_CAPS
    )
    w2, l2, _, _, _ = codec.encode_blocks_chunked(
        jnp.asarray(text), jnp.asarray(tlen), SMALL_PARAMS, SMALL_CAPS,
        chunk_steps=37,
    )
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))

    o1, ol1, _, _, _ = codec.decode_blocks_chunked(
        w2, l2, SMALL_PARAMS, SMALL_CAPS, chunk_steps=41
    )
    for i, b in enumerate(blocks):
        assert np.asarray(o1)[i, : np.asarray(ol1)[i]].tobytes() == b
