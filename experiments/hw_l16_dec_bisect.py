"""LANES=16 decoder miscompile bisect (round 4).

The L=16 ENCODER is now byte-identical to the host codec on hardware
(hw_lanes16_identity, +19.5% bench encode), but the DECODER still
corrupts output at L=16 (lanes16bench round-trip failure).  This
harness localizes the first diverging decode event:

  1. host-encode N blocks (exact streams),
  2. decode them with the VM at the CURRENT X3TPU_VM_LANES, comparing
     output bytes per lane against the originals,
  3. on mismatch, re-run the decode with the ``dbgdump`` ablate at
     nsteps=1 per launch, capturing per-event internals (esym, length,
     slot, rank, cid0, AC state, fragment bytes) and diffing them
     against the interpret-mode capture of the same launch sequence.

Run: X3TPU_VM_LANES=16 python experiments/hw_l16_dec_bisect.py [events]
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
from x3tpu.vm import decode_blocks_vm_chunked
from x3tpu.vm.config import LANES

T0 = time.time()
NEV = int(sys.argv[1]) if len(sys.argv) > 1 else 24


def log(m):
    print(f"[l16dec +{time.time()-T0:6.1f}s] {m}", flush=True)


DUMP_FIELDS = [
    "esym", "length_new", "slot_hit", "rankd", "cid0", "hit", "is_new",
    "eof", "opos", "nbits", "ac_low", "ac_high", "ac_buf",
] + [f"frag{i}" for i in range(32)]


def main():
    log(f"LANES={LANES}")
    from bench import build_corpus

    params = X3Params(max_match_count=4, window=1024)
    bb = 4 * 1024
    nblk = LANES  # one full group
    data = build_corpus(nblk * bb)
    blocks = [data[i * bb : (i + 1) * bb] for i in range(nblk)]
    caps = caps_for_block(bb)
    streams = [host.encode(b, params) for b in blocks]
    iw = max((len(s) + 3) // 4 for s in streams) + 2
    words = np.zeros((nblk, iw), np.uint32)
    lens = np.zeros((nblk,), np.int32)
    for i, s in enumerate(streams):
        a = np.frombuffer(s + b"\x00" * ((-len(s)) % 4), "<u4")
        words[i, : len(a)] = a
        lens[i] = len(s)

    log("full decode on hardware")
    out, opos, *_ = decode_blocks_vm_chunked(
        words, lens, params, caps, chunk_steps=2048
    )
    out = np.asarray(out)
    opos = np.asarray(opos)
    bad = [i for i, b in enumerate(blocks)
           if out[i, : opos[i]].tobytes() != b]
    if not bad:
        log(f"ALL {nblk} LANES={LANES} decodes CORRECT — no bisect needed")
        return 0
    log(f"lanes {bad} corrupt; first-divergence byte offsets: " + ", ".join(
        f"{i}:{next((k for k in range(min(opos[i], len(blocks[i]))) if out[i, k] != blocks[i][k]), opos[i])}"
        for i in bad[:4]))

    log(f"per-event bisect, {NEV} events (hw vs interpret; k launches "
        "of ONE event each — a single compiled kernel per mode)")
    for k in range(1, NEV + 1):
        res = {}
        for mode in ("hw", "it"):
            o = decode_blocks_vm_chunked(
                words, lens, params, caps, chunk_steps=1,
                interpret=(mode == "it"), max_launches=k,
            )
            res[mode] = (np.asarray(o[1]).copy(), np.asarray(o[0]).copy())
        oh, outh = res["hw"]
        oi, outi = res["it"]
        if not np.array_equal(oh, oi) or not np.array_equal(outh, outi):
            log(f"FIRST DIVERGENCE within the first {k} events: "
                f"opos hw={oh.tolist()} it={oi.tolist()}")
            for l in range(nblk):
                if oh[l] != oi[l] or not np.array_equal(outh[l], outi[l]):
                    lim = min(int(oh[l]), int(oi[l]))
                    d = np.nonzero(outh[l][:lim] != outi[l][:lim])[0]
                    where = int(d[0]) if len(d) else lim
                    log(f"  lane {l}: opos hw={oh[l]} it={oi[l]}, first "
                        f"out diff at byte {where}")
            return 1
    log("no divergence within the bisect window (diverges later)")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
