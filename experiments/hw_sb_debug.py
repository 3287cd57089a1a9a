"""Localize the SB>1 hardware corruption: run the sub-batched encoder
kernel on hardware and in interpret mode in lockstep (same inputs, small
chunk_steps) and report the first launch + state array where they diverge.
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
from x3tpu.config import CodecCaps, X3Params
from x3tpu.vm import driver as drv
from x3tpu.vm.config import LANES, vm_caps
from x3tpu.vm.kernel import STATE_NAMES

T0 = time.time()


def log(m):
    print(f"[+{time.time()-T0:6.1f}s] {m}", file=sys.stderr, flush=True)


SB = int(sys.argv[1]) if len(sys.argv) > 1 else 2
NST = int(sys.argv[2]) if len(sys.argv) > 2 else 32

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

step_hw = drv._get_step(vc, params, NST, G, False, frozenset(), SB=SB)
step_in = drv._get_step(vc, params, NST, G, True, frozenset(), SB=SB)

# keep host copies so donation doesn't eat the comparison arrays
fh = [np.asarray(a) for a in flat0]
fi = [np.asarray(a) for a in flat0]

log(f"SB={SB} NST={NST}: compiling hardware step")
for launch in range(80):
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
    if bad and all(n == "dictw" for _, _, n in bad):
        # dict tail bytes beyond dlens are stream-irrelevant; detail once
        if launch == 0:
            for k, s, name in bad:
                a, b = fh[k], fi[k]
                idx = np.argwhere(a != b)
                D = 256
                lanes_d = sorted(set(idx[:, 0].tolist()))
                slots = sorted(set((idx[:, 1] % D).tolist()))
                dl = fh[k - 0 + 1]  # dlens is k+1 in the same sub-batch
                log(f"  sb{s}.dictw detail: lanes {lanes_d}, slots "
                    f"{slots[:12]}, dlens of those "
                    f"{[int(dl[lanes_d[0], sl]) for sl in slots[:12]]}")
                for r, c in idx[:6]:
                    log(f"    lane{r} col{c} (plane {c//D} slot {c%D}): "
                        f"hw {a[r,c]:#010x} int {b[r,c]:#010x}")
        bad = []
    if bad:
        log(f"launch {launch} (events {launch*NST}..{(launch+1)*NST}) "
            f"DIVERGED: {[(s, n) for _, s, n in bad]}")
        for k, s, name in bad[:6]:
            a, b = fh[k], fi[k]
            idx = np.argwhere(a != b)
            log(f"  sb{s}.{name}: {len(idx)} cells, first rows "
                f"{sorted(set(idx[:20, 0].tolist()))}")
            if name == "regsi":
                for lane in sorted(set(idx[:, 0].tolist()))[:4]:
                    d = np.nonzero(a[lane] != b[lane])[0]
                    log(f"    lane {lane}: cols {d[:10].tolist()} "
                        f"hw {a[lane][d[:5]].tolist()} "
                        f"int {b[lane][d[:5]].tolist()}")
        sys.exit(1)
    regs_done = all(
        (fh[s * 19 + 13][:, 0] >= fh[s * 19 + 13][:, 1]).all()
        for s in range(SB)
    )
    if regs_done:
        log(f"completed identically after {launch+1} launches")
        sys.exit(0)
log("no divergence in 80 launches (did not finish)")
