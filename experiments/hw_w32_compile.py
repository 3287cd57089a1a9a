"""Does the 32 KiB-window VM ENCODER compile now? (round-5 queue #2)

The flat window scan's full unroll at w32 deterministically crashed the
relay compile helper (r4c: healthy relay, reproducible; the w32 DECODER
compiles fine).  The loop-over-chunks scan (VMCaps.scan_chunk, auto at
window > 8 KiB) bounds the program size; this probe is the fast
yes/no: build the w32 encoder kernel on hardware, encode a handful of
16 KiB blocks through the production dispatch, verify via the host
decoder, and report MB/s.  The full matrix rows (xml-bigwin /
tabular-bigwin + C-binary cross-decode) run separately once this says
COMPILED.

Run: python experiments/hw_w32_compile.py [lanes] [block_kib]
"""

import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

import jax.numpy as jnp

from x3tpu import codec, host
from x3tpu.config import X3Params
from x3tpu.parallel.runtime import caps_for_block
from x3tpu.vm import encode_blocks_vm_chunked
from x3tpu.vm.config import vm_caps

T0 = time.time()


def log(m):
    print(f"[w32 +{time.time()-T0:6.1f}s] {m}", flush=True)


def main():
    lanes = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    bk = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    from bench import build_corpus

    params = X3Params(window=32 * 1024)
    bb = bk * 1024
    caps = caps_for_block(bb)
    vc_probe = vm_caps(params, caps)
    log(f"scan_chunk={vc_probe.scan_chunk} wbuf={vc_probe.wbuf} "
        f"resident~{vc_probe.resident_bytes >> 20} MiB")
    data = build_corpus(lanes * bb)
    blocks = [data[i * bb : (i + 1) * bb] for i in range(lanes)]
    text, tlen = codec.pack_blocks(blocks, params, caps)
    text_j, tlen_j = jnp.asarray(text), jnp.asarray(tlen)

    log("compiling + warmup (the moment of truth)")
    out = encode_blocks_vm_chunked(text_j, tlen_j, params, caps,
                                   chunk_steps=16384)
    bl = np.asarray(out[1])
    log(f"COMPILED + ran: byte_lens {bl.tolist()[:8]}...")

    t0 = time.time()
    words, byte_lens, *_ = encode_blocks_vm_chunked(
        text_j, tlen_j, params, caps, chunk_steps=16384)
    bl = np.asarray(byte_lens)
    dt = time.time() - t0
    mbs = len(data) / dt / 1e6
    log(f"timed encode: {dt:.2f}s = {mbs:.4f} MB/s "
        f"({lanes} lanes x {bk} KiB, w32)")

    w_np = np.asarray(words)
    for i, b in enumerate(blocks):
        stream = w_np[i].astype("<u4").tobytes()[: bl[i]]
        got = host.decode(stream, max_output=len(b) + 64)
        assert got == b, f"round-trip fail lane {i}"
    log(f"host cross-decode OK on all {lanes} lanes — w32 VM encoder "
        "is CORRECT on hardware")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
