"""Decoder codec-VM per-phase budget dissection on real TPU hardware
(round-3 verdict #5: the decoder never had an ablation story).

Decode control flow is driven by decoded values, so REMOVING a phase
derails the stream and the event count (unlike the encoder, where p
advances regardless).  Instead each ablation DUPLICATES a phase: the
kernel computes the phase twice, with the duplicate's inputs perturbed
by a runtime-never-true predicate (oflow register < 0) so neither CSE
nor DCE can collapse it, and its result folded in through a select on
the same predicate.  Streams stay bit-exact, event counts identical,
and (t_dup - t_base) is the phase's marginal cost.

Usage: python experiments/hw_vm_ablate_dec.py [lanes] [block_kib] [window]
Env:   X3TPU_ABLATE_CORPUS=bench for the official bench corpus.
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
WIN = int(sys.argv[3]) if len(sys.argv) > 3 else 8192
BB = BK * 1024
CS = 8192
T0 = time.time()


def log(msg):
    print(f"[ablate-dec +{time.time()-T0:6.1f}s] {msg}", flush=True)


def corpus(n):
    import os
    which = os.environ.get("X3TPU_ABLATE_CORPUS", "")
    if which == "bench":
        from bench import build_corpus
        return build_corpus(n)
    if which == "so":
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
    ]
    out = []
    while sum(map(len, out)) < n:
        out.append(words[rng.integers(len(words))])
        out.append(b" ")
    return b"".join(out)[:n]


params = X3Params(window=WIN)
caps = caps_for_block(BB)
data = corpus(LANES * BB)
blocks = [data[i * BB : (i + 1) * BB] for i in range(LANES)]
text, tlen = codec.pack_blocks(blocks, params, caps)
G = (LANES + 7) // 8

log("encoding the corpus once (VM) to produce the decode input")
w, bl, cnt, sz, of = encode_blocks_vm_chunked(
    text, tlen, params, caps, chunk_steps=CS
)
w_np = np.asarray(w)
bl_np = np.asarray(bl)
ev_tot = int(np.asarray(cnt).sum(axis=1).max())
iw = (int(bl_np.max()) + 3) // 4 + 2
words_in = np.ascontiguousarray(w_np[:, :iw].astype(np.uint32))
lens_in = bl_np
log(f"encoded: max {bl_np.max()} bytes/lane, ev_max={ev_tot}")

# dup2/pay2/... duplicate one phase each (see kernel_dec.py's
# duplicated-phase ablation note)
ABLATIONS = [
    frozenset(),
    frozenset({"dup2"}),      # dictionary dup probe (O(D))
    frozenset({"pay2"}),      # payload decode: ixf model + row searches
    frozenset({"mtf2"}),      # dictionary MTF / insert vector ops
    frozenset({"emit2"}),     # output extraction + barrel shift
    frozenset({"row2"}),      # ctx row find/stats (ph_payload side)
    frozenset({"ev2"}),       # event + length AC decode chains (round 5)
    frozenset({"lit2"}),      # literal-byte AC chain, per loop iteration
]

_sel = __import__("os").environ.get("X3TPU_ABLATE_SET")
if _sel:
    ABLATIONS = [frozenset() if s.strip() == "full"
                 else frozenset(s.strip().split("+"))
                 for s in _sel.split(",") if s.strip()]

base = None
for ab in ABLATIONS:
    tag = "+".join(sorted(ab)) or "full"
    t0 = time.time()
    try:
        out = decode_blocks_vm_chunked(
            words_in, lens_in, params, caps, chunk_steps=CS, ablate=ab
        )
        _ = np.asarray(out[1])
    except Exception as e:
        log(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}")
        continue
    tc = time.time() - t0
    t0 = time.time()
    o, opos, *_ = decode_blocks_vm_chunked(
        words_in, lens_in, params, caps, chunk_steps=CS, ablate=ab
    )
    opos_np = np.asarray(opos)  # value read = the only real sync (probe9)
    dt = time.time() - t0
    o_np = np.asarray(o)
    ok = all(
        o_np[i, : opos_np[i]].tobytes() == blocks[i] for i in range(LANES)
    )
    us = dt / (ev_tot * G) * 1e6
    if base is None:
        base = us
    log(f"{tag:10s} compile {tc:6.1f}s steady {dt:6.2f}s -> {us:6.1f} "
        f"us/event-group (delta {us - base:+6.1f}) roundtrip="
        f"{'OK' if ok else 'FAIL'}")

log("done")
