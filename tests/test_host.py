"""Native host codec: bit-exact vs golden reference streams and the spec."""

import numpy as np
import pytest

from x3tpu import host, spec
from x3tpu.config import X3Params

from conftest import GOLDEN, PARAMSETS, golden_cases

try:
    host.encode(b"probe")
    HAVE = True
except host.HostCodecUnavailable:
    HAVE = False

pytestmark = pytest.mark.skipif(not HAVE, reason="no g++ toolchain")


@pytest.mark.parametrize("name,pname", golden_cases())
def test_host_encode_matches_reference(name, pname):
    data = (GOLDEN / f"{name}.bin").read_bytes()
    golden = (GOLDEN / f"{name}.{pname}.x3").read_bytes()
    ours = host.encode(data, X3Params(**PARAMSETS[pname]))
    assert ours == golden


@pytest.mark.parametrize("name,pname", golden_cases())
def test_host_decode_reference_stream(name, pname):
    data = (GOLDEN / f"{name}.bin").read_bytes()
    golden = (GOLDEN / f"{name}.{pname}.x3").read_bytes()
    assert host.decode(golden) == data


def test_host_large_roundtrip():
    """Bigger-than-golden input: host codec vs spec on 60 KB of mixed data."""
    rng = np.random.default_rng(42)
    text = open("/root/reference/x3.c", "rb").read()
    data = text + rng.integers(0, 256, 8000, dtype=np.uint8).tobytes() + text
    params = X3Params(max_match_count=8, window=2048)
    stream = host.encode(data, params)
    assert stream == spec.encode(data, params)
    assert host.decode(stream) == data


def test_host_high_ratio_decode():
    data = b"\x00" * 100_000
    stream = host.encode(data, X3Params(max_match_count=4, window=1024))
    assert host.decode(stream, max_output=1 << 20) == data


def test_host_decode_cap_autogrow():
    """A >64:1 stream with the default cap must auto-grow, not abort the
    process (x3h_decode rc=2 contract; the old code called abort())."""
    data = bytes(1 << 20)
    stream = host.encode(data)  # ratio ~2880:1, beyond the 64:1 guess
    assert host.decode(stream) == data


def test_host_decode_errors_raise():
    """Corrupt streams and too-small explicit caps raise RuntimeError
    instead of killing the embedding process."""
    import pytest

    with pytest.raises(RuntimeError):
        host.decode(b"\xff" * 64, max_output=1 << 16)
    stream = host.encode(b"payload " * 400)
    with pytest.raises(RuntimeError):
        host.decode(stream, max_output=8)
