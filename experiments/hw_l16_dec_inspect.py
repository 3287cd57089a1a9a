"""Lockstep hw-vs-interpret state diff for the LANES=16 decoder
miscompile (round-5 queue #1).

Decoder twin of hw_sb_inspect.py: host-encode one lane group of blocks,
then run the decoder kernel one event per launch (NST=1) on hardware and
in interpret mode in lockstep, diffing ALL 20 carried state arrays after
every launch.  On the first divergence, names the arrays/lanes/cells and
— when the ``dbgdump`` ablate is on (argv) — decodes the per-event
internals dump (kernel_dec.py clobbers the ch array with esym,
length_new, slot_hit, rankd, cid0, hit/is_new/eof, opos, nbits, AC
low/high/buf, frag32).

Run: X3TPU_VM_LANES=16 python experiments/hw_l16_dec_inspect.py \
        [launches] [dbgdump]
ONE TPU process at a time (CLAUDE.md).
"""

import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if __import__("os").environ.get("JAX_PLATFORMS", "") == "cpu":
    jax.config.update("jax_platforms", "cpu")  # sitecustomize pins axon
sys.path.insert(0, "/root/repo")

import jax.numpy as jnp

from x3tpu import host
from x3tpu.config import X3Params
from x3tpu.parallel.runtime import caps_for_block
from x3tpu.vm import driver as drv
from x3tpu.vm.config import LANES, set_active_lanes, vm_caps
from x3tpu.vm.kernel_dec import N_STATE_DEC, STATE_NAMES_DEC

T0 = time.time()
LAUNCHES = int(sys.argv[1]) if len(sys.argv) > 1 else 64
ablate = frozenset(sys.argv[2].split(",")) if len(sys.argv) > 2 else frozenset()


def log(m):
    print(f"[l16ins +{time.time()-T0:6.1f}s] {m}", flush=True)


DUMP = ["esym", "length_new", "slot_hit", "rankd", "cid0", "hit",
        "is_new", "eof", "opos", "nbits", "ac_low", "ac_high", "ac_buf"]


def explain_dump(ah, ai):
    for lane in range(LANES):
        if np.array_equal(ah[lane], ai[lane]):
            continue
        d = np.nonzero(ah[lane] != ai[lane])[0]
        log(f"  dump lane{lane}: diff cols {d[:16].tolist()}")
        for c in d:
            name = DUMP[c] if c < len(DUMP) else (
                f"frag{c - len(DUMP)}" if c < len(DUMP) + 32 else f"col{c}")
            log(f"    {name}: hw {ah[lane][c]} it {ai[lane][c]}")


def main():
    log(f"LANES={LANES} ablate={sorted(ablate)}")
    from bench import build_corpus

    params = X3Params(max_match_count=4, window=1024)
    bb = 4 * 1024
    nblk = LANES
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

    set_active_lanes(LANES)
    vc = vm_caps(params, caps)
    sb, G = 1, 1
    srows = drv._dec_srows(vc, iw)
    obrows = drv._dec_obrows(vc)
    hbm_rows = (obrows, vc.r0, vc.r1)
    srcflat, state = drv._init_state_dec(
        jnp.asarray(words, jnp.uint32), jnp.asarray(lens, jnp.int32), vc,
        G, srows, obrows)
    srcs = drv._split_rows(srcflat, G, sb, srows)
    flat0 = drv._split_state(state, G, sb, vc, hbm_rows, n_vmem=17)

    # CPU smoke mode: no Mosaic backend, so "hw" is interpret too — the
    # run then just validates the harness plumbing end to end
    on_cpu = jax.default_backend() == "cpu"
    step_hw = drv._get_step_dec(vc, params, 1, G, srows, obrows, on_cpu,
                                SB=sb, ablate=ablate, lanes=LANES)
    step_it = drv._get_step_dec(vc, params, 1, G, srows, obrows, True,
                                SB=sb, ablate=ablate, lanes=LANES)

    fh = [np.asarray(a) for a in flat0]
    fi = [np.asarray(a) for a in flat0]
    log("state ready; compiling (first launch)")
    for launch in range(LAUNCHES):
        oh = step_hw(*srcs, *[jnp.asarray(a) for a in fh])
        oi = step_it(*srcs, *[jnp.asarray(a) for a in fi])
        fh = [np.asarray(a) for a in oh]
        fi = [np.asarray(a) for a in oi]
        if launch == 0:
            log("first launch done (compiled)")
        bad = []
        for k in range(len(fh)):
            name = STATE_NAMES_DEC[k % N_STATE_DEC]
            if name == "regsf":
                if not np.allclose(fh[k], fi[k], rtol=1e-4, atol=1e-3):
                    bad.append((k, name))
                continue
            if not np.array_equal(fh[k], fi[k]):
                bad.append((k, name))
        if bad:
            log(f"launch {launch} (event {launch}) DIVERGED: "
                f"{[n for _, n in bad]}")
            for k, name in bad:
                if name == "ch" and "dbgdump" in ablate:
                    explain_dump(fh[k], fi[k])
                    continue
                a, b = fh[k], fi[k]
                idx = np.argwhere(a != b)
                log(f"  {name}: {len(idx)} cells, lanes "
                    f"{sorted(set(idx[:64, 0].tolist()))}, first "
                    f"{[(int(r), int(c), int(a[r, c]), int(b[r, c])) for r, c in idx[:6]]}")
            return 1
        regs = fh[13]
        if (regs[:, 22] != 0).all():  # R_DONE
            log(f"completed identically after {launch+1} events")
            return 0
    log(f"no divergence in {LAUNCHES} single-event launches")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
