"""Compare hardware VM encode streams at SB=1 (trusted, round-2 product
config) vs SB>1 on identical inputs — they must be byte-identical by
construction.  Prints the first differing lane/byte.  ONE TPU process at
a time (CLAUDE.md)."""

import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

sys.path.insert(0, "/root/repo")
from bench import build_corpus
from x3tpu import codec
from x3tpu.config import X3Params
from x3tpu.parallel.runtime import caps_for_block
from x3tpu.vm.driver import encode_blocks_vm_chunked

T0 = time.time()


def log(m):
    print(f"[+{time.time()-T0:6.1f}s] {m}", file=sys.stderr, flush=True)


lanes = int(sys.argv[1]) if len(sys.argv) > 1 else 16
block_kib = int(sys.argv[2]) if len(sys.argv) > 2 else 4
sb_test = int(sys.argv[3]) if len(sys.argv) > 3 else 2
ablate = frozenset(
    sys.argv[4].split(",")) if len(sys.argv) > 4 else frozenset()

params = X3Params()
block = block_kib * 1024
caps = caps_for_block(block)
data = build_corpus(lanes * block)
blocks = [data[i * block : (i + 1) * block] for i in range(lanes)]
log(f"backend={jax.default_backend()} lanes={lanes} block={block_kib}KiB")

import jax.numpy as jnp

text, tlen = codec.pack_blocks(blocks, params, caps)
streams = {}
for sb in (1, sb_test):
    t0 = time.time()
    words, byte_lens, counts, sizes, of = encode_blocks_vm_chunked(
        jnp.asarray(text), jnp.asarray(tlen), params, caps, subs=sb,
        ablate=ablate,
    )
    words_np = np.asarray(words)
    lens_np = np.asarray(byte_lens)
    payloads = [
        words_np[i].astype("<u4").tobytes()[: lens_np[i]]
        for i in range(lanes)
    ]
    log(f"SB={sb}: encoded in {time.time()-t0:.1f}s, "
        f"sizes {[len(p) for p in payloads][:8]}...")
    streams[sb] = payloads

bad = 0
for i, (a, c) in enumerate(zip(streams[1], streams[sb_test])):
    if a == c:
        continue
    bad += 1
    n = min(len(a), len(c))
    j = next((k for k in range(n) if a[k] != c[k]), n)
    log(f"lane {i}: DIFF at byte {j}/{min(len(a), len(c))} "
        f"(lens {len(a)} vs {len(c)}) "
        f"sb1={a[max(0,j-2):j+4].hex()} sb{sb_test}={c[max(0,j-2):j+4].hex()}")
log(f"{bad}/{lanes} lanes differ" if bad else "ALL LANES IDENTICAL")
sys.exit(1 if bad else 0)
