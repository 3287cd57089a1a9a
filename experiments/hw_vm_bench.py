"""Codec-VM encoder throughput on real TPU hardware.

Usage: python experiments/hw_vm_bench.py [lanes] [block_kib] [chunk_steps] [window]
Times chunked VM encode of `lanes` blocks of `block_kib` KiB, prints MB/s,
and cross-checks a round-trip through the host decoder.
"""

import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

sys.path.insert(0, "/root/repo")

from x3tpu import codec
from x3tpu.config import CodecCaps, X3Params
from x3tpu.parallel.runtime import caps_for_block
from x3tpu.vm import encode_blocks_vm_chunked

LANES = int(sys.argv[1]) if len(sys.argv) > 1 else 8
BK = int(sys.argv[2]) if len(sys.argv) > 2 else 16
CS = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
WIN = int(sys.argv[4]) if len(sys.argv) > 4 else 8192

BB = BK * 1024
PARAMS = X3Params(window=WIN)  # reference defaults: -t 15 -w 8
T0 = time.time()


def log(msg):
    print(f"[vmbench +{time.time()-T0:6.1f}s] {msg}", flush=True)


def corpus(n):
    """Mixed text corpus, same generator family as bench.py."""
    rng = np.random.default_rng(42)
    words = [
        b"the", b"compression", b"dictionary", b"context", b"adaptive",
        b"arithmetic", b"coder", b"window", b"match", b"entropy", b"block",
        b"stream", b"symbol", b"frequency", b"model", b"event", b"encode",
    ]
    out = []
    while sum(map(len, out)) < n:
        out.append(words[rng.integers(len(words))])
        out.append(b" ")
        if rng.random() < 0.05:
            out.append(b"\n")
    return b"".join(out)[:n]


data = corpus(LANES * BB)
blocks = [data[i * BB : (i + 1) * BB] for i in range(LANES)]
caps = caps_for_block(BB)
log(f"lanes={LANES} block={BK}KiB window={WIN} chunk={CS} caps dict={caps.dict_cap}")

text, tlen = codec.pack_blocks(blocks, PARAMS, caps)

# warmup/compile with a copy (donated args)
log("compile + warmup...")
t0 = time.time()
w, bl, cnt, sz, of = encode_blocks_vm_chunked(
    text, tlen, PARAMS, caps, chunk_steps=CS
)
jax.block_until_ready(w)
log(f"first encode (incl compile): {time.time()-t0:.1f}s")

t0 = time.time()
w, bl, cnt, sz, of = encode_blocks_vm_chunked(
    text, tlen, PARAMS, caps, chunk_steps=CS
)
jax.block_until_ready(w)
dt = time.time() - t0
mb = LANES * BB / 1e6
log(f"timed encode: {dt:.2f}s -> {mb/dt:.4f} MB/s")

of_any = False
for f in of._fields:
    if np.asarray(getattr(of, f)).any():
        log(f"OVERFLOW {f}: {np.asarray(getattr(of, f)).tolist()}")
        of_any = True

w = np.asarray(w)
bl = np.asarray(bl)
comp = int(bl.sum())
log(f"compressed {LANES*BB} -> {comp} bytes (ratio {LANES*BB/comp:.3f})")

# round-trip through the C++ host decoder
from x3tpu import host

ok = True
for i in range(LANES):
    payload = w[i].astype("<u4").tobytes()[: bl[i]]
    got = host.decode(payload, max_output=len(blocks[i]) + 64)
    if got != blocks[i]:
        ok = False
        log(f"ROUND-TRIP FAIL lane {i}")
log("round-trip OK (host decoder)" if ok else "ROUND-TRIP FAILURES")
sys.exit(0 if (ok and not of_any) else 1)
