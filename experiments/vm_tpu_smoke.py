"""First hardware run of the codec-VM kernel: compile, encode a small
corpus at reference-default params, verify via the native host decoder,
print per-chunk timings.  ONE TPU process at a time (CLAUDE.md)."""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

sys.path.insert(0, "/root/repo")
from bench import build_corpus
from x3tpu import codec, host
from x3tpu.config import X3Params
from x3tpu.parallel.runtime import caps_for_block
from x3tpu.vm.driver import encode_blocks_vm_chunked

T0 = time.time()


def log(m):
    print(f"[+{time.time()-T0:6.1f}s] {m}", file=sys.stderr, flush=True)


lanes = int(sys.argv[1]) if len(sys.argv) > 1 else 8
block_kib = int(sys.argv[2]) if len(sys.argv) > 2 else 4
chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 1024

params = X3Params()  # -t 15 -w 8
block = block_kib * 1024
caps = caps_for_block(block)
data = build_corpus(lanes * block)
blocks = [data[i * block : (i + 1) * block] for i in range(lanes)]
log(f"backend={jax.default_backend()} lanes={lanes} block={block_kib}KiB "
    f"chunk={chunk}")

import jax.numpy as jnp

text, tlen = codec.pack_blocks(blocks, params, caps)
log("corpus packed; launching VM encode (compile on first chunk)")
t0 = time.time()
words, byte_lens, counts, sizes, of = encode_blocks_vm_chunked(
    jnp.asarray(text), jnp.asarray(tlen), params, caps, chunk_steps=chunk
)
jax.block_until_ready(byte_lens)
log(f"cold encode done in {time.time()-t0:.2f}s")

t0 = time.time()
words, byte_lens, counts, sizes, of = encode_blocks_vm_chunked(
    jnp.asarray(text), jnp.asarray(tlen), params, caps, chunk_steps=chunk
)
jax.block_until_ready(byte_lens)
dt = time.time() - t0
mbs = len(data) / dt / 1e6
log(f"warm encode: {dt:.3f}s = {mbs:.4f} MB/s "
    f"({mbs/0.0508:.1f}x reference core)")

anyof = {f for f in of._fields if np.asarray(getattr(of, f)).any()}
log(f"overflow: {sorted(anyof) or 'none'}")

words_np = np.asarray(words)
lens_np = np.asarray(byte_lens)
bad = 0
for i, b in enumerate(blocks):
    stream = words_np[i].astype("<u4").tobytes()[: lens_np[i]]
    got = host.decode(stream, max_output=len(b) + 64)
    if got != b:
        bad += 1
        log(f"lane {i}: ROUND-TRIP FAIL ({len(got)} vs {len(b)} bytes)")
log("round-trip: " + ("ALL OK" if not bad else f"{bad} FAILURES"))
sys.exit(1 if bad or anyof else 0)
