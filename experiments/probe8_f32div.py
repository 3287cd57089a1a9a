"""Mosaic probe round 8: f32 two-stage division in the AC coding chain.

Round 1 recorded a crash mixing fptosi/f32-divide with the bit sink's
variable shifts (probe5 S7/S9); the compile cliff was later traced to
maxui / i1-select legalization, both absent from udiv_u32_fast.  This
probe re-tests the full mix on hardware: ac_encode with the fast divider
vs the restoring-loop divider, compared bit-for-bit, plus a rough timing
loop of each.
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
if "--interpret" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")

from x3tpu.vm import prims

I32 = jnp.int32
U32 = jnp.uint32
L = 8
INTERPRET = "--interpret" in sys.argv
ROUNDS = 16


def make_kernel(fast):
    div = prims.udiv_u32_fast if fast else prims.udiv_u32

    def kernel(lo_ref, sp_ref, tt_ref, o_ref):
        # chained AC encodes: the sink window + registers carried through
        # ROUNDS symbol codings, exercising variable shifts + renorm +
        # division together
        st = dict(
            low=jnp.zeros((L, 1), U32),
            high=jnp.full((L, 1), 0x7FFFFFFF, U32),
            scale=jnp.zeros((L, 1), I32),
            nbits=jnp.zeros((L, 1), I32),
            win_base=jnp.zeros((L, 1), I32),
            win=jnp.zeros((L, 2 * 256), I32),
            oflow=jnp.zeros((L, 1), jnp.bool_),
        )
        act = jnp.ones((L, 1), jnp.bool_)
        orig = prims.udiv_u32
        prims.udiv_u32 = div  # route ac_encode through the chosen divider
        try:
            for k in range(ROUNDS):
                lo = lo_ref[:, k : k + 1]
                sp = sp_ref[:, k : k + 1]
                tt = tt_ref[:, k : k + 1]
                st = prims.ac_encode(st, lo, sp, tt, act)
        finally:
            prims.udiv_u32 = orig
        o_ref[:, :512] = st["win"]
        i = jax.lax.broadcasted_iota(I32, (L, 640), 1)
        o_ref[:, :] = jnp.where(i == 512, st["nbits"],
                                jnp.where(i == 513, st["low"].astype(I32),
                                          o_ref[:, :]))

    return kernel


def run(fast, lo, sp, tt):
    return pl.pallas_call(
        make_kernel(fast),
        out_shape=jax.ShapeDtypeStruct((L, 640), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )(lo, sp, tt)


def main():
    rng = np.random.default_rng(5)
    tt = rng.integers(1, 5000, (L, ROUNDS)).astype(np.int32)
    lo = (rng.random((L, ROUNDS)) * (tt - 1)).astype(np.int32)
    sp = np.minimum(1 + rng.integers(0, 50, (L, ROUNDS)), tt - lo).astype(np.int32)

    t0 = time.time()
    slow = np.asarray(run(False, lo, sp, tt))
    print(f"slow divider: compiled+ran in {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    try:
        fast = np.asarray(run(True, lo, sp, tt))
    except Exception as e:
        print(f"FAST DIVIDER FAILED: {type(e).__name__}: {str(e)[:300]}")
        return 1
    print(f"fast divider: compiled+ran in {time.time()-t0:.1f}s", flush=True)
    ok = (slow == fast).all()
    print("BIT-EXACT" if ok else "MISMATCH", flush=True)
    if not ok:
        bad = np.nonzero((slow != fast).any(axis=1))[0]
        print("bad rows:", bad[:8].tolist())
        return 1

    # rough timing: many launches back to back
    for name, f in (("slow", False), ("fast", True)):
        t0 = time.time()
        for _ in range(20):
            out = run(f, lo, sp, tt)
        jax.block_until_ready(out)
        print(f"{name}: {(time.time()-t0)/20*1e3:.2f} ms / 16-symbol launch",
              flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
