"""Full codec-VM encoder kernel on real TPU hardware: compile + bit-exactness.

Usage: python experiments/hw_vm_encode.py [block_bytes] [chunk_steps]
"""

import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

sys.path.insert(0, "/root/repo")

from x3tpu import codec, spec
from x3tpu.config import CodecCaps, X3Params
from x3tpu.vm import encode_blocks_vm_chunked

BB = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
CS = int(sys.argv[2]) if len(sys.argv) > 2 else 512

PARAMS = X3Params(max_match_count=4, window=256)
CAPS = CodecCaps(
    dict_cap=1024, pair_cap=2048, ctx_items_cap=128,
    ctx0_items_cap=128, ctx_small_cap=16, block_bytes=BB,
)


def log(msg):
    print(f"[hwvm +{time.time()-T0:6.1f}s] {msg}", flush=True)


T0 = time.time()
log(f"devices: {jax.devices()}")

rng = np.random.default_rng(11)
golden = open("/root/repo/tests/golden/text_small.bin", "rb").read()
blocks = [
    (b"abracadabra " * 400)[:BB],
    golden[:BB],
    rng.integers(0, 256, min(400, BB), np.uint8).tobytes(),
    b"\x00" * min(1200, BB),
]
text, tlen = codec.pack_blocks(blocks, PARAMS, CAPS)
log(f"packed {len(blocks)} blocks, text {text.shape}")

words, byte_lens, counts, sizes, of = encode_blocks_vm_chunked(
    text, tlen, PARAMS, CAPS, chunk_steps=CS, interpret=False
)
words = np.asarray(words)
byte_lens = np.asarray(byte_lens)
log(f"encode done, byte_lens={byte_lens.tolist()}")
for f in of._fields:
    assert not np.asarray(getattr(of, f)).any(), f"overflow {f}"
ok = True
for i, b in enumerate(blocks):
    got = words[i].astype("<u4").tobytes()[: byte_lens[i]]
    want = spec.encode(b, PARAMS)
    if got != want:
        ok = False
        log(f"MISMATCH block {i} ({len(b)}B): got {len(got)}B want {len(want)}B")
log("BIT-EXACT vs spec" if ok else "FAILED bit-exactness")
sys.exit(0 if ok else 1)
