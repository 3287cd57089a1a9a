"""Codec-VM encoder scaling probe on real TPU hardware.

One process, several (lanes, block_kib, chunk, window) configs: per-config
compile time, steady-state MB/s, µs/event.  Round-trip checked via the
host decoder on the first config only (bit-exactness is covered elsewhere).
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
from x3tpu.vm import encode_blocks_vm_chunked

T0 = time.time()


def log(msg):
    print(f"[scale +{time.time()-T0:6.1f}s] {msg}", flush=True)


def corpus(n):
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


CONFIGS = [
    # lanes, block_kib, chunk, window
    (8, 16, 1024, 8192),
    (8, 16, 8192, 8192),
    (32, 16, 8192, 8192),
    (8, 16, 8192, 1024),
    (8, 64, 8192, 8192),
]

for li, (lanes, bk, cs, win) in enumerate(CONFIGS):
    bb = bk * 1024
    params = X3Params(window=win)
    caps = caps_for_block(bb)
    data = corpus(lanes * bb)
    blocks = [data[i * bb : (i + 1) * bb] for i in range(lanes)]
    text, tlen = codec.pack_blocks(blocks, params, caps)
    t0 = time.time()
    out = encode_blocks_vm_chunked(text, tlen, params, caps, chunk_steps=cs)
    jax.block_until_ready(out[0])
    tc = time.time() - t0
    t0 = time.time()
    w, bl, cnt, sz, of = encode_blocks_vm_chunked(
        text, tlen, params, caps, chunk_steps=cs
    )
    jax.block_until_ready(w)
    dt = time.time() - t0
    mb = lanes * bb / 1e6
    cnt = np.asarray(cnt)
    ev_max = int(cnt.sum(axis=1).max())  # lockstep steps ~ max events/lane
    g = (lanes + 7) // 8
    us_ev = dt / (ev_max * g) * 1e6
    of_any = any(np.asarray(getattr(of, f)).any() for f in of._fields)
    log(
        f"L={lanes:3d} bk={bk:3d}K cs={cs} W={win}: compile+warm {tc:6.1f}s "
        f"steady {dt:6.2f}s -> {mb/dt:7.4f} MB/s  "
        f"({us_ev:6.1f} us/event-group, max_ev={ev_max}, G={g})"
        + ("  OVERFLOW!" if of_any else "")
    )
    if li == 0:
        from x3tpu import host

        wn, bln = np.asarray(w), np.asarray(bl)
        ok = all(
            host.decode(wn[i].astype("<u4").tobytes()[: bln[i]],
                        max_output=bb + 64) == blocks[i]
            for i in range(lanes)
        )
        log("round-trip OK" if ok else "ROUND-TRIP FAIL")

log("done")
