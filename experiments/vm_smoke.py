"""Interpreter-mode smoke test of the codec-VM encoder vs the spec oracle."""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from x3tpu import codec, spec
from x3tpu.config import CodecCaps, X3Params
from x3tpu.vm.driver import encode_blocks_vm_chunked

params = X3Params(max_match_count=4, window=256)
caps = CodecCaps(
    dict_cap=128, pair_cap=512, ctx_items_cap=128, ctx0_items_cap=128,
    ctx_small_cap=16, block_bytes=2048,
)

import pathlib
golden = pathlib.Path("tests/golden/text_small.bin").read_bytes()
blocks = [
    b"abracadabra " * 40,
    b"",
    golden[:1200],
    bytes(range(256)) * 3,
    b"A",
    np.random.default_rng(0).integers(0, 256, 700, np.uint8).tobytes(),
    b"\x00" * 1500,
    golden[1200:2400],
]

text, tlen = codec.pack_blocks(blocks, params, caps)
words, byte_lens, counts, sizes, of = encode_blocks_vm_chunked(
    text, tlen, params, caps, chunk_steps=2048, interpret=True
)
words = np.asarray(words)
byte_lens = np.asarray(byte_lens)
ok = True
for i, b in enumerate(blocks):
    got = words[i].astype("<u4").tobytes()[: byte_lens[i]]
    want = spec.encode(b, params)
    if got != want:
        ok = False
        # find first diff
        n = min(len(got), len(want))
        d = next((j for j in range(n) if got[j] != want[j]), n)
        print(f"block {i} ({len(b)}B): MISMATCH len {len(got)} vs "
              f"{len(want)}, first diff @ byte {d}")
    else:
        print(f"block {i} ({len(b)}B): OK ({len(got)}B)")
anyof = {
    f: np.asarray(getattr(of, f)).nonzero()[0].tolist()
    for f in of._fields
    if np.asarray(getattr(of, f)).any()
}
print("overflow:", anyof or "none")
sys.exit(0 if ok and not anyof else 1)
