"""Per-event internals diff for the SB>1 hardware corruption: run the
encoder kernel with the ``dbgdump`` ablate (kernel.py clobbers the ch
array with phase-D/F/G internals each event) on hardware and in
interpret mode in lockstep, and decode the first diverging dump.
ONE TPU process at a time (CLAUDE.md)."""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from x3tpu import codec
from x3tpu.config import MAX_MATCH_LEN, CodecCaps, X3Params
from x3tpu.vm import driver as drv
from x3tpu.vm.config import LANES, vm_caps
from x3tpu.vm.kernel import STATE_NAMES

T0 = time.time()
MML = MAX_MATCH_LEN


def log(m):
    print(f"[+{time.time()-T0:6.1f}s] {m}", file=sys.stderr, flush=True)


SB = int(sys.argv[1]) if len(sys.argv) > 1 else 2
NST = int(sys.argv[2]) if len(sys.argv) > 2 else 1
LAUNCHES = int(sys.argv[3]) if len(sys.argv) > 3 else 400
extra = frozenset(sys.argv[4].split(",")) if len(sys.argv) > 4 else frozenset()
ablate = frozenset({"dbgdump"}) | extra

params = X3Params(window=256, max_match_count=4)
caps = CodecCaps(dict_cap=256, pair_cap=1024, ctx_items_cap=64,
                 ctx0_items_cap=64, block_bytes=1024)
vc = vm_caps(params, caps)

lanes = SB * LANES
base = open("/root/repo/x3tpu/codec.py", "rb").read()
rng = np.random.default_rng(3)
blocks = []
for i in range(lanes):
    s = bytes(base[i * 120 : i * 120 + 800])
    blocks.append(s + rng.integers(0, 256, 100, np.uint8).tobytes())
text, tlen = codec.pack_blocks(blocks, params, caps)

G = 1
Gt = G * SB
trows = vc.text_bytes // 128
orows = vc.out_words // 128
hbm_rows = (orows, vc.r0, vc.r1)

text_flat = drv._prep_text(jnp.asarray(text, jnp.uint8), vc, Gt,
                           text.shape[1])
tlen_p = jnp.asarray(tlen, jnp.int32)
state = drv._init_state(text_flat, tlen_p, vc, Gt)
texts = drv._split_rows(text_flat, G, SB, trows)
flat0 = drv._split_state(state, G, SB, vc, hbm_rows)

step_hw = drv._get_step(vc, params, NST, G, False, ablate, SB=SB)
step_in = drv._get_step(vc, params, NST, G, True, ablate, SB=SB)

FIELDS = [("fbm", MML), ("found", MML + 1), ("slot", MML + 2),
          ("dlen", MML + 3), ("hit", MML + 4), ("miss", MML + 5),
          ("mode", MML + 6), ("mlen", MML + 7), ("p", MML + 8),
          ("d_n", MML + 9)]


def explain(ah, ai, s):
    """Decode a diverging ch dump pair for sub-batch s."""
    for lane in range(LANES):
        if np.array_equal(ah[lane], ai[lane]):
            continue
        d = np.nonzero(ah[lane] != ai[lane])[0]
        log(f"  sb{s} lane{lane}: diff cols {d[:12].tolist()}")
        names = [(n, c) for n, c in FIELDS if c in set(d.tolist())]
        if (d < MML).any():
            log(f"    counts hw {ah[lane][:MML].tolist()}")
            log(f"    counts in {ai[lane][:MML].tolist()}")
        for n, c in names:
            log(f"    {n}: hw {ah[lane][c]} int {ai[lane][c]}")
        tw = [c for c in d if MML + 10 <= c < MML + 18]
        if tw:
            log(f"    tw diffs at {tw}: hw "
                f"{[hex(int(ah[lane][c]) & 0xffffffff) for c in tw]} int "
                f"{[hex(int(ai[lane][c]) & 0xffffffff) for c in tw]}")
        wl = [c for c in d if MML + 18 <= c < MML + 82]
        if wl:
            log(f"    winlo[{[c - MML - 18 for c in wl]}]: hw "
                f"{[ah[lane][c] for c in wl]} int "
                f"{[ai[lane][c] for c in wl]}")


fh = [np.asarray(a) for a in flat0]
fi = [np.asarray(a) for a in flat0]
log(f"SB={SB} NST={NST} ablate={sorted(ablate)}: compiling")
for launch in range(LAUNCHES):
    oh = step_hw(*texts, *[jnp.asarray(a) for a in fh])
    oi = step_in(*texts, *[jnp.asarray(a) for a in fi])
    fh = [np.asarray(a) for a in oh]
    fi = [np.asarray(a) for a in oi]
    if launch == 0:
        log("first launch done (compiled)")
    bad = []
    for k in range(len(fh)):
        name = STATE_NAMES[k % 19]
        if name == "regsf":
            if not np.allclose(fh[k], fi[k], rtol=1e-4, atol=1e-3):
                bad.append((k, k // 19, name))
            continue
        if not np.array_equal(fh[k], fi[k]):
            bad.append((k, k // 19, name))
    if bad:
        log(f"launch {launch} (events {launch*NST}..{(launch+1)*NST}) "
            f"DIVERGED: {[(s, n) for _, s, n in bad]}")
        for k, s, name in bad:
            if name == "ch":
                explain(fh[k], fi[k], s)
        for k, s, name in bad[:8]:
            if name == "ch":
                continue
            a, b = fh[k], fi[k]
            idx = np.argwhere(a != b)
            log(f"  sb{s}.{name}: {len(idx)} cells, lanes "
                f"{sorted(set(idx[:20, 0].tolist()))}, first "
                f"{[(int(r), int(c), int(a[r, c]), int(b[r, c])) for r, c in idx[:4]]}")
        sys.exit(1)
    regs_done = all(
        (fh[s * 19 + 13][:, 0] >= fh[s * 19 + 13][:, 1]).all()
        for s in range(SB)
    )
    if regs_done:
        log(f"completed identically after {launch+1} launches")
        sys.exit(0)
log(f"no divergence in {LAUNCHES} launches (did not finish)")
