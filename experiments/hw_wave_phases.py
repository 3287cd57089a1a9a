"""Where does wave-level decode time go at MB-block configs?

The 'wave vs kernel-level 2.3x decode gap' (BENCH_NOTES round 4) was
measured against hw_vm_dec.py, which times with jax.block_until_ready —
and per probe9 that does NOT wait through the axon tunnel.  The chunked
driver's launch loop syncs itself (the _any_active readbacks), but the
merge + finalize graph after it runs async, so the kernel-level number
EXCLUDES it while the production wave path (value reads) pays it.

This probe times decode in phases, each closed by a VALUE READ:
  init    — _init_state_dec + split (state build on device)
  launch  — the chunked launch loop (internally synced)
  final   — _merge_state + _finalize_dec + output readback
on a 4 MiB-block config (binary-4mb twin).  If final dominates, the
"gap" is state-plumbing, not kernel speed, and the fix is aliasing /
avoiding the split-merge reshapes at SB=1.

Usage: python experiments/hw_wave_phases.py [block_mib] [corpus] [perlaunch]
  corpus: "frag" (default; repeated 4 KiB random fragment) or "so"
          (site-packages shared objects — the bench_matrix binary-4mb
          twin, the corpus behind the 0.1873 MB/s config-#3 number)
  perlaunch: any third arg -> run 2 adds a VALUE-READ SYNC AFTER EVERY
          LAUNCH and prints each launch's wall time + live lanes, so
          fixed per-launch overhead separates from in-kernel event cost
          (round-4 falsified the sync-loop theory; run 1 here falsified
          init/finalize — the gap lives inside the launches)
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
sys.path.insert(0, "/root/repo")

from x3tpu import codec
from x3tpu.config import X3Params
from x3tpu.parallel.runtime import caps_for_block
from x3tpu.vm import driver as dv
from x3tpu.vm import encode_blocks_vm_chunked
from x3tpu.vm.config import dec_lanes, set_active_lanes, vm_caps

T0 = time.time()


def log(m):
    print(f"[phases +{time.time()-T0:6.1f}s] {m}", flush=True)


def sync(x):
    """Value-read sync (probe9 rule): read one element to host.  Only
    the read leaf's producer chain is provably drained; phase splits
    are therefore approximate, the total is exact (the launches consume
    every state array, and the final output read is a full transfer)."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    _ = np.asarray(leaf[(0,) * leaf.ndim])


def main():
    mib = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    corpus = sys.argv[2] if len(sys.argv) > 2 else "frag"
    perlaunch = len(sys.argv) > 3
    bb = mib << 20
    if corpus == "so":
        import pathlib
        SP = pathlib.Path("/opt/venv/lib/python3.12/site-packages")
        sos = sorted(SP.rglob("*.so"), key=lambda p: -p.stat().st_size)
        data = b"".join(p.read_bytes() for p in sos[:16])[:bb]
    else:
        rng = np.random.default_rng(3)
        # hyper-redundant block (ratio ~90; few, long events)
        frag = rng.integers(0, 256, 4096, np.uint8).tobytes()
        data = (frag * (bb // 4096 + 1))[:bb]
    params = X3Params()
    caps = caps_for_block(bb)
    log(f"block {mib} MiB, caps dict={caps.dict_cap}")
    text, tlen = codec.pack_blocks([data], params, caps)
    w, bl, *_ = encode_blocks_vm_chunked(text, tlen, params, caps,
                                         chunk_steps=16384)
    w_np = np.asarray(w).astype("<u4")
    bl_np = np.asarray(bl)
    log(f"encoded: {bl_np[0]} bytes (ratio {bb/bl_np[0]:.3f})")

    # phase-timed decode, twice (first run may compile)
    for it in range(2):
        set_active_lanes(dec_lanes())
        vc = vm_caps(params, caps)
        L_in, IW = w_np.shape
        sb = 1
        G = max(1, -(-L_in // (sb * dec_lanes())))
        srows = dv._dec_srows(vc, IW)
        obrows = dv._dec_obrows(vc)
        hbm_rows = (obrows, vc.r0, vc.r1)

        t0 = time.time()
        srcflat, state = dv._init_state_dec(
            jnp.asarray(w_np, dv.U32), jnp.asarray(bl_np, dv.I32), vc, G,
            srows, obrows)
        srcs = dv._split_rows(srcflat, G, sb, srows)
        flat = dv._split_state(state, G, sb, vc, hbm_rows, n_vmem=17)
        sync(flat[-1])
        t_init = time.time() - t0

        step = dv._get_step_dec(vc, params, 16384, G, srows, obrows,
                                False, SB=sb, lanes=dec_lanes())
        t0 = time.time()
        bound = max(1, -(-(vc.block_bytes + 1) // 16384))
        done, batch = 0, 4
        if perlaunch and it == 1:
            # per-launch dissection: sync EVERY launch by a value read of
            # the done flags; prints (launch, seconds, live lanes).  The
            # extra ~33 ms/launch tunnel sync is visible but small next
            # to the ~0.4 s/launch being investigated.
            while True:
                regs = np.asarray(flat[13])
                live = int((regs[:, 22] == 0).sum())  # R_DONE
                if live == 0:
                    break
                assert done <= bound + 2, "no progress"
                tl = time.time()
                flat = step(*srcs, *flat)
                _ = np.asarray(flat[13][0, 0])  # value-read sync
                log(f"  launch {done}: {time.time()-tl:6.3f}s "
                    f"live={live}")
                done += 1
        else:
            while bool(dv._any_active_dec_subs(flat, sb)):
                assert done <= bound + 2, "no progress"
                for _ in range(max(1, min(batch, bound - done))):
                    flat = step(*srcs, *flat)
                    done += 1
                batch = min(2 * batch, 256)
        t_launch = time.time() - t0

        t0 = time.time()
        state = dv._merge_state(flat, G, sb, vc, hbm_rows,
                                n=dv.N_STATE_DEC, n_vmem=17)
        out, opos, *_ = dv._finalize_dec(state, vc, obrows)
        out_np = np.asarray(out)
        opos_np = np.asarray(opos)
        t_final = time.time() - t0

        tot = t_init + t_launch + t_final
        log(f"run {it}: init {t_init:.2f}s  launch {t_launch:.2f}s "
            f"({done} launches)  final {t_final:.2f}s  total {tot:.2f}s "
            f"= {bb/tot/1e6:.4f} MB/s")
        ok = out_np[0, :opos_np[0]].tobytes() == data
        log("bit-exact" if ok else "MISMATCH!")
        if not ok:
            return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
