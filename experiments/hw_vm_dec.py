"""Codec-VM decoder on real TPU hardware: compile, bit-exactness, speed.

Usage: python experiments/hw_vm_dec.py [lanes] [block_kib] [chunk_steps] [window]
Encodes a corpus with the VM encoder, decodes with the VM decoder, checks
byte-exactness, and times both directions steady-state.
"""

import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

sys.path.insert(0, "/root/repo")

from x3tpu import codec
from x3tpu.config import X3Params
from x3tpu.parallel.runtime import caps_for_block
from x3tpu.vm import decode_blocks_vm_chunked, encode_blocks_vm_chunked

LANES = int(sys.argv[1]) if len(sys.argv) > 1 else 8
BK = int(sys.argv[2]) if len(sys.argv) > 2 else 16
CS = int(sys.argv[3]) if len(sys.argv) > 3 else 8192
WIN = int(sys.argv[4]) if len(sys.argv) > 4 else 8192

BB = BK * 1024
PARAMS = X3Params(window=WIN)
T0 = time.time()


def log(msg):
    print(f"[hwdec +{time.time()-T0:6.1f}s] {msg}", flush=True)


def corpus(n):
    import os
    if os.environ.get("X3TPU_DEC_CORPUS") == "bench":
        from bench import build_corpus
        return build_corpus(n)
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
log(f"lanes={LANES} block={BK}KiB window={WIN} chunk={CS}")

text, tlen = codec.pack_blocks(blocks, PARAMS, caps)
t0 = time.time()
w, bl, cnt, sz, of = encode_blocks_vm_chunked(
    text, tlen, PARAMS, caps, chunk_steps=CS
)
jax.block_until_ready(w)
log(f"encode done ({time.time()-t0:.1f}s incl compile)")
for f in of._fields:
    assert not np.asarray(getattr(of, f)).any(), f"enc overflow {f}"

w_np = np.asarray(w).astype("<u4")
bl_np = np.asarray(bl)

t0 = time.time()
out, opos, dcnt, dsz, dof = decode_blocks_vm_chunked(
    w_np, bl_np, PARAMS, caps, chunk_steps=CS
)
jax.block_until_ready(out)
log(f"decode done ({time.time()-t0:.1f}s incl compile)")
for f in dof._fields:
    assert not np.asarray(getattr(dof, f)).any(), f"dec overflow {f}"

out = np.asarray(out)
opos = np.asarray(opos)
ok = True
for i, b in enumerate(blocks):
    if out[i, : opos[i]].tobytes() != b:
        ok = False
        log(f"MISMATCH lane {i}")
log("DECODE BIT-EXACT on hardware" if ok else "DECODE FAILED")

# steady-state timings
t0 = time.time()
w2, bl2, *_ = encode_blocks_vm_chunked(text, tlen, PARAMS, caps, chunk_steps=CS)
jax.block_until_ready(w2)
te = time.time() - t0
t0 = time.time()
out2, opos2, *_ = decode_blocks_vm_chunked(
    w_np, bl_np, PARAMS, caps, chunk_steps=CS
)
jax.block_until_ready(out2)
td = time.time() - t0
mb = LANES * BB / 1e6
log(f"steady encode {te:.2f}s -> {mb/te:.4f} MB/s")
log(f"steady decode {td:.2f}s -> {mb/td:.4f} MB/s")
sys.exit(0 if ok else 1)
