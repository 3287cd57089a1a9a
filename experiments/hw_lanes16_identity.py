"""LANES=16 stream-identity probe (round 4).

The L>8 lane-broadcast miscompile failed this configuration every round
(CLAUDE.md), but the round-4 toolchain/queue pass round-tripped at
X3TPU_VM_LANES=16 (vm_tpu_smoke rc=0).  Round-trip alone could hide a
CONSISTENT encoder+decoder miscompile, so this probe compares the
LANES=16 VM encoder's streams BYTE-FOR-BYTE against the native host
codec (bit-exact vs the reference by the test suite) on a diverse
corpus — the strong form of the check.

Run: X3TPU_VM_LANES=16 python experiments/hw_lanes16_identity.py
"""

import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
sys.path.insert(0, "/root/repo")

from x3tpu import codec, host
from x3tpu.config import X3Params
from x3tpu.parallel.runtime import caps_for_block
from x3tpu.vm import encode_blocks_vm_chunked
from x3tpu.vm import config as vmc

T0 = time.time()


def log(m):
    print(f"[l16id +{time.time()-T0:6.1f}s] {m}", flush=True)


def main():
    log(f"kernel group widths enc={vmc.enc_lanes()} dec={vmc.dec_lanes()}")
    from bench import build_corpus

    params = X3Params(max_match_count=4, window=1024)
    bb = 8 * 1024
    nblk = 24  # 1.5 groups at LANES=16 (exercises group 2 addressing)
    data = build_corpus(nblk * bb)
    rng = np.random.default_rng(5)
    blocks = [data[i * bb : (i + 1) * bb] for i in range(nblk - 2)]
    blocks.append(rng.integers(0, 256, bb, np.uint8).tobytes())
    blocks.append(b"\x00" * bb)
    caps = caps_for_block(bb)
    text, tlen = codec.pack_blocks(blocks, params, caps)
    w, bl, cnt, sz, of = encode_blocks_vm_chunked(
        text, tlen, params, caps, chunk_steps=4096
    )
    w = np.asarray(w)
    bl = np.asarray(bl)
    log("encode done; comparing vs host streams")
    bad = 0
    for i, b in enumerate(blocks):
        got = w[i].astype("<u4").tobytes()[: bl[i]]
        want = host.encode(b, params)
        if got != want:
            bad += 1
            log(f"lane {i}: MISMATCH ({len(got)} vs {len(want)} bytes)")
    if bad:
        log(f"FAIL: {bad}/{len(blocks)} lanes differ from the host codec")
        return 1
    log(f"OK: all {len(blocks)} enc-lanes={vmc.LANES} streams "
        "byte-identical to the host codec")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
