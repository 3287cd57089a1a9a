"""Differential fuzzing (SURVEY.md §7 hard part #5): random inputs across
alphabets and sizes through the native host codec vs the spec oracle, plus
spot checks through the JAX codec."""

import numpy as np
import pytest

from x3tpu import host, spec
from x3tpu.config import X3Params

try:
    host.encode(b"probe")
    HAVE = True
except host.HostCodecUnavailable:
    HAVE = False

pytestmark = pytest.mark.skipif(not HAVE, reason="no g++ toolchain")

PARAMS = [
    X3Params(max_match_count=3, window=1024),
    X3Params(max_match_count=15, window=8192),
    X3Params(max_match_count=1, window=1024, magic_factor1=0),
]


def _random_input(rng) -> bytes:
    n = int(rng.integers(0, 400))
    kind = rng.integers(0, 4)
    if kind == 0:
        return rng.bytes(n)
    if kind == 1:
        return bytes(rng.choice(list(b"ab"), n))
    if kind == 2:
        return bytes(rng.choice(list(b"abcdefgh \n\t.,"), n))
    rep = bytes(rng.choice(list(b"xyz01"), max(int(rng.integers(1, 9)), 1)))
    return (rep * (n // max(len(rep), 1) + 1))[:n]


def test_fuzz_host_vs_spec():
    rng = np.random.default_rng(2026)
    for trial in range(150):
        data = _random_input(rng)
        params = PARAMS[trial % len(PARAMS)]
        s_spec = spec.encode(data, params)
        s_host = host.encode(data, params)
        assert s_host == s_spec, f"trial {trial}: encode mismatch ({len(data)}B)"
        assert spec.decode(s_spec) == data, f"trial {trial}: spec decode"
        assert host.decode(s_host, max_output=1 << 20) == data, (
            f"trial {trial}: host decode"
        )


def test_fuzz_jax_spot_checks():
    from x3tpu import codec
    from x3tpu.config import CodecCaps

    rng = np.random.default_rng(7)
    caps = CodecCaps(dict_cap=512, pair_cap=2048, ctx_items_cap=128,
                     ctx0_items_cap=128, block_bytes=1024)
    params = X3Params(max_match_count=3, window=1024)
    blocks = [_random_input(rng)[:1024] for _ in range(6)]
    streams = codec.encode_blocks(blocks, params, caps)
    for i, b in enumerate(blocks):
        assert streams[i] == spec.encode(b, params), f"block {i}"
    outs = codec.decode_blocks(streams, params, caps)
    for i, b in enumerate(blocks):
        assert outs[i] == b, f"block {i} decode"
