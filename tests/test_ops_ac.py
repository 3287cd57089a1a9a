"""Differential tests: lane-parallel bit I/O and arithmetic coder vs the
NumPy spec oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from x3tpu import spec
from x3tpu.ops import ac as jac
from x3tpu.ops import bitio

# jit the step functions: eager while_loops re-trace on every call
_ac_encode = jax.jit(jac.ac_encode)
_ac_flush = jax.jit(jac.ac_flush)
_ac_decode_update = jax.jit(jac.ac_decode_update)
_put_bit = jax.jit(bitio.sink_put_bit)
_get_bit = jax.jit(bitio.source_get_bit)


def _sink_bytes(sink, lane):
    nbytes = int(bitio.sink_byte_len(sink)[lane])
    return np.asarray(sink.words[lane]).astype("<u4").tobytes()[:nbytes]


def test_sink_matches_spec_bitwriter():
    rng = np.random.default_rng(0)
    lanes = 3
    bits = [rng.integers(0, 2, size=200) for _ in range(lanes)]
    # lane 1 writes fewer bits
    bits[1] = bits[1][:57]

    sink = bitio.sink_init(lanes, 16)
    maxlen = max(len(b) for b in bits)
    for i in range(maxlen):
        bit = jnp.asarray(
            [b[i] if i < len(b) else 0 for b in bits], dtype=jnp.uint32
        )
        active = jnp.asarray([i < len(b) for b in bits])
        sink = _put_bit(sink, bit, active)

    for lane in range(lanes):
        w = spec.BitWriter()
        for b in bits[lane]:
            w.write_bit(int(b))
        assert _sink_bytes(sink, lane) == w.close()
    assert not bool(sink.overflow.any())


def test_sink_overflow_flag():
    sink = bitio.sink_init(1, 1)  # one word = 32 bits capacity
    on = jnp.asarray([True])
    one = jnp.asarray([1], dtype=jnp.uint32)
    for _ in range(40):
        sink = _put_bit(sink, one, on)
    assert bool(sink.overflow[0])


def test_source_matches_spec_bitreader():
    rng = np.random.default_rng(1)
    streams = [rng.bytes(4 * rng.integers(1, 9)) for _ in range(4)]
    streams[2] = b""  # empty stream reads sentinel
    maxw = max(1, max(len(s) for s in streams) // 4)
    words = np.zeros((4, maxw), dtype="<u4")
    lens = []
    for i, s in enumerate(streams):
        arr = np.frombuffer(s, dtype="<u4")
        words[i, : len(arr)] = arr
        lens.append(len(s))
    src = bitio.source_init(jnp.asarray(words), jnp.asarray(lens))
    refs = [spec.BitReader(s) for s in streams]
    on = jnp.ones((4,), jnp.bool_)
    for _ in range(150):
        src, bit = _get_bit(src, on)
        for lane, r in enumerate(refs):
            assert int(bit[lane]) == r.read_bit()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ac_encode_decode_matches_spec(seed):
    """Code random adaptive-model symbol streams on 4 lanes; bits must match
    the spec encoder exactly, and the lane decoder must recover them."""
    rng = np.random.default_rng(seed)
    lanes = 4
    nsyms = [int(rng.integers(20, 120)) for _ in range(lanes)]
    alpha = 11
    seqs = [rng.integers(0, alpha, size=n) for n, _ in zip(nsyms, range(lanes))]

    # --- spec encode per lane
    spec_streams = []
    for lane in range(lanes):
        w = spec.BitWriter()
        e = spec.ArithEncoder(w)
        m = spec.AdaptiveModel(alpha)
        for s in seqs[lane]:
            e.encode_symbol(m, int(s))
            m.inc(int(s))
        e.flush()
        spec_streams.append(w.close())

    # --- lane-parallel encode
    sink = bitio.sink_init(lanes, 64)
    enc = jac.enc_init(lanes)
    freqs = np.ones((lanes, alpha), np.int32)
    maxn = max(nsyms)
    for i in range(maxn):
        active = jnp.asarray([i < n for n in nsyms])
        sym = np.asarray([seqs[l][i] if i < nsyms[l] else 0 for l in range(lanes)])
        low_f = np.asarray([freqs[l, : sym[l]].sum() for l in range(lanes)], np.int32)
        high_f = low_f + freqs[np.arange(lanes), sym]
        total = freqs.sum(axis=1).astype(np.int32)
        enc, sink = _ac_encode(
            enc, sink, jnp.asarray(low_f), jnp.asarray(high_f),
            jnp.asarray(total), active,
        )
        upd = np.asarray(active)
        freqs[np.arange(lanes)[upd], sym[upd]] += 1
    sink = _ac_flush(enc, sink, jnp.ones((lanes,), jnp.bool_))

    for lane in range(lanes):
        assert _sink_bytes(sink, lane) == spec_streams[lane], f"lane {lane}"

    # --- lane-parallel decode of those very streams
    src = bitio.source_init(sink.words, bitio.sink_byte_len(sink))
    dec, src = jac.dec_init(src, lanes)
    freqs = np.ones((lanes, alpha), np.int32)
    for i in range(maxn):
        active = np.asarray([i < n for n in nsyms])
        total = freqs.sum(axis=1).astype(np.int32)
        step, value = jac.ac_decode_value(dec, jnp.asarray(total))
        value_np = np.asarray(value)
        cum = np.cumsum(np.concatenate([np.zeros((lanes, 1), np.int32), freqs], 1), 1)
        sym = np.asarray(
            [(np.searchsorted(cum[l], value_np[l], side="right") - 1) for l in range(lanes)]
        )
        sym = np.clip(sym, 0, alpha - 1)
        for l in range(lanes):
            if active[l] and i < nsyms[l]:
                assert sym[l] == seqs[l][i], f"lane {l} sym {i}"
        low_f = np.asarray([cum[l, sym[l]] for l in range(lanes)], np.int32)
        high_f = np.asarray([cum[l, sym[l] + 1] for l in range(lanes)], np.int32)
        dec, src = _ac_decode_update(
            dec, src, step, jnp.asarray(low_f), jnp.asarray(high_f),
            jnp.asarray(active),
        )
        freqs[np.arange(lanes)[active], sym[active]] += 1


def test_ac_closed_form_stress_skewed():
    """Adversarial: heavily skewed adaptive models maximize E3 underflow
    chains and long renorm runs; closed-form must match the spec coder."""
    rng = np.random.default_rng(99)
    lanes = 2
    alpha = 3
    # skewed: mostly symbol 0, rare 1/2 -> tiny intervals, long runs
    seqs = [rng.choice([0, 0, 0, 0, 0, 0, 0, 1, 2], size=400) for _ in range(lanes)]

    spec_streams = []
    for lane in range(lanes):
        w = spec.BitWriter()
        e = spec.ArithEncoder(w)
        m = spec.AdaptiveModel(alpha, (1000, 1, 1))
        for s in seqs[lane]:
            e.encode_symbol(m, int(s))
            m.inc(int(s))
        e.flush()
        spec_streams.append(w.close())

    sink = bitio.sink_init(lanes, 128)
    enc = jac.enc_init(lanes)
    freqs = np.tile(np.asarray([1000, 1, 1], np.int32), (lanes, 1))
    for i in range(400):
        sym = np.asarray([seqs[l][i] for l in range(lanes)])
        low_f = np.asarray([freqs[l, : sym[l]].sum() for l in range(lanes)], np.int32)
        high_f = low_f + freqs[np.arange(lanes), sym]
        total = freqs.sum(axis=1).astype(np.int32)
        enc, sink = _ac_encode(
            enc, sink, jnp.asarray(low_f), jnp.asarray(high_f),
            jnp.asarray(total), jnp.ones((lanes,), bool),
        )
        freqs[np.arange(lanes), sym] += 1
    sink = _ac_flush(enc, sink, jnp.ones((lanes,), jnp.bool_))
    for lane in range(lanes):
        assert _sink_bytes(sink, lane) == spec_streams[lane], f"lane {lane}"

    # decode side
    src = bitio.source_init(sink.words, bitio.sink_byte_len(sink))
    dec, src = jac.dec_init(src, lanes)
    freqs = np.tile(np.asarray([1000, 1, 1], np.int32), (lanes, 1))
    for i in range(400):
        total = freqs.sum(axis=1).astype(np.int32)
        step, value = jac.ac_decode_value(dec, jnp.asarray(total))
        value_np = np.asarray(value)
        cum = np.cumsum(np.concatenate([np.zeros((lanes, 1), np.int32), freqs], 1), 1)
        sym = np.asarray([
            np.searchsorted(cum[l], value_np[l], side="right") - 1
            for l in range(lanes)
        ])
        for l in range(lanes):
            assert sym[l] == seqs[l][i], f"lane {l} sym {i}"
        low_f = np.asarray([cum[l, sym[l]] for l in range(lanes)], np.int32)
        high_f = np.asarray([cum[l, sym[l] + 1] for l in range(lanes)], np.int32)
        dec, src = _ac_decode_update(
            dec, src, step, jnp.asarray(low_f), jnp.asarray(high_f),
            jnp.ones((lanes,), bool),
        )
        freqs[np.arange(lanes), sym] += 1
