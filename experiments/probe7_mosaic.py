"""Mosaic hardware probe round 7: lane-broadcast idioms at L > 8.

Round 1 found the implicit [L,1]->[L,D] broadcast SILENTLY MISCOMPILES for
L > 8 (CLAUDE.md).  The whole codec-VM therefore runs 8 lanes per grid
step.  This probe checks whether any alternative broadcast idiom is sound
at L = 16/32 — if one is, the VM can widen its lane groups and multiply
per-chip throughput.

Idioms:
  a  implicit broadcast:      where(iota == idx, v, 0)
  b  broadcast_in_dim first:  where(iota == bcast(idx), v, 0)
  c  pltpu.repeat:            where(iota == repeat(idx), v, 0)
  d  sublane roll-reduce:     broadcast built by log2(L) row rolls
  e  reduction the other way: sum over [L, D] -> [L, 1] masked sums
"""

import functools
import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

I32 = jnp.int32
INTERPRET = "--interpret" in sys.argv
if INTERPRET:
    jax.config.update("jax_platforms", "cpu")


def run(name, kernel, L, D, idx, want):
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L, D), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=INTERPRET,
        )(idx)
        ok = (np.asarray(out) == want).all()
        print(f"  {name}: {'OK' if ok else 'WRONG RESULTS'}", flush=True)
        if not ok:
            bad = np.nonzero((np.asarray(out) != want).any(axis=1))[0]
            print(f"    bad rows: {bad[:8].tolist()}", flush=True)
        return ok
    except Exception as e:
        print(f"  {name}: FAILED {type(e).__name__}: {str(e)[:120]}",
              flush=True)
        return False


def main():
    for L in (8, 16, 32):
        D = 1024
        rng = np.random.default_rng(L)
        idx = rng.integers(0, D, (L, 1)).astype(np.int32)
        want = np.zeros((L, D), np.int32)
        for l in range(L):
            want[l, idx[l, 0]] = 1

        print(f"L={L}:", flush=True)

        def ka(idx_ref, o_ref, L=L, D=D):
            iota = jax.lax.broadcasted_iota(I32, (L, D), 1)
            o_ref[:, :] = jnp.where(iota == idx_ref[:, 0:1], 1, 0)

        def kb(idx_ref, o_ref, L=L, D=D):
            iota = jax.lax.broadcasted_iota(I32, (L, D), 1)
            b = jax.lax.broadcast_in_dim(idx_ref[:, 0:1], (L, D), (0, 1))
            o_ref[:, :] = jnp.where(iota == b, 1, 0)

        def kc(idx_ref, o_ref, L=L, D=D):
            iota = jax.lax.broadcasted_iota(I32, (L, D), 1)
            r = pltpu.repeat(idx_ref[:, 0:1], D, axis=1)
            o_ref[:, :] = jnp.where(iota == r, 1, 0)

        def kd(idx_ref, o_ref, L=L, D=D):
            # explicit lane fill: start with [L, 128] tile where column 0
            # holds idx, build the full-row broadcast by log2(128) rolls,
            # then tile to D by concatenation
            iota = jax.lax.broadcasted_iota(I32, (L, 128), 1)
            x = jnp.where(iota == 0, idx_ref[:, 0:1], 0)
            s = 1
            while s < 128:
                x = x | jnp.where(iota >= s, pltpu.roll(x, s, axis=1), 0)
                s *= 2
            full = jnp.concatenate([x] * (D // 128), axis=1)
            i2 = jax.lax.broadcasted_iota(I32, (L, D), 1)
            o_ref[:, :] = jnp.where(i2 == full, 1, 0)

        run("a implicit", ka, L, D, idx, want)
        run("b broadcast_in_dim", kb, L, D, idx, want)
        run("c pltpu.repeat", kc, L, D, idx, want)
        run("d roll-fill", kd, L, D, idx, want)

        # e: [L, D] -> [L, 1] masked reduction correctness
        vals = rng.integers(0, 100, (L, D)).astype(np.int32)
        want_e = np.zeros((L, D), np.int32)
        want_e[:, 0] = [vals[l, idx[l, 0]] for l in range(L)]

        def ke(v_ref, idx_ref, o_ref, L=L, D=D):
            iota = jax.lax.broadcasted_iota(I32, (L, D), 1)
            sel = jnp.sum(
                jnp.where(iota == idx_ref[:, 0:1], v_ref[:, :], 0),
                axis=1, keepdims=True,
            )
            o_ref[:, :] = jnp.where(iota == 0, sel, 0)

        try:
            out = pl.pallas_call(
                ke,
                out_shape=jax.ShapeDtypeStruct((L, D), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                interpret=INTERPRET,
            )(vals, idx)
            ok = (np.asarray(out) == want_e).all()
            print(f"  e masked-reduce: {'OK' if ok else 'WRONG RESULTS'}",
                  flush=True)
        except Exception as e:
            print(f"  e masked-reduce: FAILED {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
