"""Encoder codec-VM per-phase budget dissection on real TPU hardware.

Runs the same config with phases ablated (WRONG OUTPUT — perf only) and
prints the us/event-group delta each phase costs.

Usage: python experiments/hw_vm_ablate.py [lanes] [block_kib] [window]
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

LANES = int(sys.argv[1]) if len(sys.argv) > 1 else 8
BK = int(sys.argv[2]) if len(sys.argv) > 2 else 16
WIN = int(sys.argv[3]) if len(sys.argv) > 3 else 8192
BB = BK * 1024
CS = 8192
T0 = time.time()


def log(msg):
    print(f"[ablate +{time.time()-T0:6.1f}s] {msg}", flush=True)


def corpus(n):
    import os
    which = os.environ.get("X3TPU_ABLATE_CORPUS", "")
    if which == "bench":
        from bench import build_corpus
        return build_corpus(n)
    if which == "so":
        # binary-class corpus (config #3 proxy): biggest site-packages .so
        import pathlib
        sos = sorted(
            pathlib.Path("/opt/venv/lib/python3.12/site-packages")
            .rglob("*.so"), key=lambda p: -p.stat().st_size,
        )
        blob = b"".join(p.read_bytes() for p in sos[:16])
        return (blob * (n // max(len(blob), 1) + 1))[:n]
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


params = X3Params(window=WIN)
caps = caps_for_block(BB)
data = corpus(LANES * BB)
blocks = [data[i * BB : (i + 1) * BB] for i in range(LANES)]
text, tlen = codec.pack_blocks(blocks, params, caps)
G = (LANES + 7) // 8

ABLATIONS = [
    frozenset(),
    frozenset({"noscan"}),
    frozenset({"nosweep"}),
    frozenset({"noscan", "nosweep"}),
    frozenset({"noac", "nolit"}),
    frozenset({"nodma"}),
    frozenset({"noprobe"}),
    frozenset({"noscan", "nosweep", "noac", "nolit", "noprobe"}),
]

# X3TPU_ABLATE_SET="full,noscan,noprobe" picks a subset (giant configs:
# each ablation is its own multi-minute remote compile)
_sel = __import__("os").environ.get("X3TPU_ABLATE_SET")
if _sel:
    keys = [frozenset() if s.strip() == "full"
            else frozenset(s.strip().split("+"))
            for s in _sel.split(",") if s.strip()]
    ABLATIONS = keys

base_ev = None
for ab in ABLATIONS:
    tag = "+".join(sorted(ab)) or "full"
    t0 = time.time()
    try:
        out = encode_blocks_vm_chunked(
            text, tlen, params, caps, chunk_steps=CS, ablate=ab
        )
        jax.block_until_ready(out[0])
    except Exception as e:
        log(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}")
        continue
    tc = time.time() - t0
    t0 = time.time()
    w, bl, cnt, sz, of = encode_blocks_vm_chunked(
        text, tlen, params, caps, chunk_steps=CS, ablate=ab
    )
    jax.device_get(bl)  # block_until_ready does not wait through axon
    dt = time.time() - t0
    ev_max = int(np.asarray(cnt).sum(axis=1).max())
    if base_ev is None:
        base_ev = ev_max
    # ablations change event counts (semantics differ); normalize to the
    # BASELINE event count so deltas are comparable per-launch-step
    us = dt / (base_ev * G) * 1e6
    log(f"{tag:44s} compile {tc:6.1f}s steady {dt:6.2f}s "
        f"-> {us:6.1f} us/event-group (ev_max={ev_max})")

log("done")
