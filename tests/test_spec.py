"""Tests of the executable format spec (x3tpu.spec) against itself and
against golden streams produced by the reference C binary."""

import numpy as np
import pytest

from x3tpu import spec
from x3tpu.config import X3Params

from conftest import GOLDEN, PARAMSETS, golden_cases


def params_for(pname: str) -> X3Params:
    return X3Params(**PARAMSETS[pname])


# ---------------------------------------------------------------------------
# Bit-format invariants (SURVEY.md §0 table)
# ---------------------------------------------------------------------------


def test_empty_input_is_4_bytes():
    # Empty input -> coded E_EOF + flush = one u32 word (measured vs ref).
    stream = spec.encode(b"")
    assert len(stream) == 4
    assert spec.decode(stream) == b""


def test_empty_matches_reference_golden():
    golden = (GOLDEN / "empty.t15_w8.x3").read_bytes()
    assert spec.encode(b"") == golden


def test_stream_length_is_word_aligned():
    stream = spec.encode(b"hello world, hello world, hello")
    assert len(stream) % 4 == 0


def test_bitio_roundtrip():
    rng = np.random.default_rng(7)
    w = spec.BitWriter()
    items = []
    for _ in range(500):
        n = int(rng.integers(1, 25))
        v = int(rng.integers(0, 1 << n))
        items.append((v, n))
        w.write_bits(v, n)
    data = w.close()
    r = spec.BitReader(data)
    for v, n in items:
        assert r.read_bits(n) == v


def test_bitreader_sentinel():
    # Reads past the end yield 0x80000000 words (bio.c:30-42): bit 31 set.
    r = spec.BitReader(b"")
    bits = [r.read_bit() for _ in range(64)]
    assert bits[:31] == [0] * 31
    assert bits[31] == 1
    assert bits[32:63] == [0] * 31
    assert bits[63] == 1


def test_bitreader_trailing_bytes_dropped():
    # A word at byte offset o is readable iff o < size-3 (bio.c:11).
    data = np.asarray([0xAAAAAAAA, 0xBBBBBBBB], dtype="<u4").tobytes()
    r = spec.BitReader(data[:6])  # second word incomplete -> sentinel
    assert r.read_bits(32) == 0xAAAAAAAA
    assert r.read_bits(32) == 0x80000000


def test_ac_known_stream_roundtrip():
    # Code a fixed symbol sequence through one adaptive model and decode it.
    rng = np.random.default_rng(3)
    syms = [int(s) for s in rng.integers(0, 16, size=200)]
    w = spec.BitWriter()
    enc = spec.ArithEncoder(w)
    m = spec.AdaptiveModel(16)
    for s in syms:
        enc.encode_symbol(m, s)
        m.inc(s)
    enc.flush()
    data = w.close()
    m2 = spec.AdaptiveModel(16)
    dec = spec.ArithDecoder(spec.BitReader(data))
    out = []
    for _ in syms:
        s = dec.decode_symbol(m2)
        m2.inc(s)
        out.append(s)
    assert out == syms


# ---------------------------------------------------------------------------
# Round-trips
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "data",
    [
        b"A",
        b"aaaa" * 32,
        b"abracadabra " * 40,
        bytes(range(256)) * 4,
        np.random.default_rng(0).integers(0, 256, 3000, dtype=np.uint8).tobytes(),
        b"\x00" * 2048,  # ratio > 64:1 crashes the reference decoder
                          # (undersized output buffer, x3.c:621); ours is fine
    ],
)
def test_spec_roundtrip(data):
    params = X3Params(max_match_count=4, window=1024)
    stream = spec.encode(data, params)
    assert spec.decode(stream) == data


def test_decode_is_parameter_independent():
    # The format is headerless: any params decode any stream (SURVEY.md §0).
    data = b"the quick brown fox jumps over the lazy dog. " * 30
    s1 = spec.encode(data, X3Params(max_match_count=15, window=8192))
    s2 = spec.encode(data, X3Params(max_match_count=2, window=1024))
    assert spec.decode(s1) == data
    assert spec.decode(s2) == data


def test_estimated_vs_real_size():
    # Encoder-side estimated bits track the real compressed size closely
    # (x3.c:677-678 self-check; agreement ~0.1% on text).
    data = (GOLDEN / "text_small.bin").read_bytes()
    stream = spec.encode(data, params_for("t4_w1"))
    est = spec.encode.last_stats.estimated_bytes
    assert abs(est - len(stream)) / len(stream) < 0.02


# ---------------------------------------------------------------------------
# Bit-exactness vs reference golden streams
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name,pname", golden_cases())
def test_encode_matches_reference(name, pname):
    data = (GOLDEN / f"{name}.bin").read_bytes()
    golden = (GOLDEN / f"{name}.{pname}.x3").read_bytes()
    ours = spec.encode(data, params_for(pname))
    assert ours == golden, (
        f"{name}/{pname}: ours {len(ours)}B vs golden {len(golden)}B"
    )


@pytest.mark.parametrize("name,pname", golden_cases())
def test_decode_reference_stream(name, pname):
    data = (GOLDEN / f"{name}.bin").read_bytes()
    golden = (GOLDEN / f"{name}.{pname}.x3").read_bytes()
    assert spec.decode(golden) == data
