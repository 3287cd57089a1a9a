"""Cost model of the codec-VM event loop's building blocks on real TPU.

Each variant is a tiny Pallas kernel with a scalar-carried while_loop of N
iterations; the body exercises ONE cost class.  (time_variant - time_empty)
/ N = the per-iteration cost of that class.  This tells us where the
~70-190 us/event-group of the full encoder kernel actually goes:

  empty      loop + 1 vector op                       (baseline)
  vops32     + 32 chained [8,128] adds                (small-tile op cost)
  scan       + 31x3 ops on [8,8192]                   (window-scan class)
  sync1/4    + 1/4 vector->scalar handoffs            (pipeline sync cost)
  when8      + 8 per-lane pl.when, pred false, no DMA (branch cost)
  dma8       + 8 per-lane 1-row HBM->VMEM start+wait  (row DMA cost)
  dma8f      same, pred false                         (gated-out DMA cost)
  dma2       + 2-lane version of dma8                 (per-DMA linearity)
  vv8        + 8 per-lane 1-row VMEM->VMEM start+wait (VMEM DMA cost)

Usage: python experiments/probe9_costmodel.py
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

sys.path.insert(0, "/root/repo")

L = 8
N = 16384
W = 8192
I32 = jnp.int32
T0 = time.time()


def log(msg):
    print(f"[probe9 +{time.time()-T0:6.1f}s] {msg}", flush=True)


def make_kernel(variant):
    def kern(hbm, out, big, xfer, sem, *, variant=variant):
        out[:, :] = jnp.zeros((L, 128), I32)
        big[:, :] = jnp.zeros((L, W), I32)

        def body(carry):
            step, acc = carry
            out[:, :] = out[:, :] + 1

            if variant == "vops32":
                x = out[:, :]
                for _ in range(32):
                    x = x + 1
                out[:, :] = x

            elif variant == "scan":
                x = big[:, :]
                run = x == x[:, 0:1]
                tot = jnp.zeros((L, 1), I32)
                for _ in range(31):
                    run = run & (x < 128)
                    tot = tot + jnp.sum(run.astype(I32), axis=1,
                                        keepdims=True)
                iw = jax.lax.broadcasted_iota(I32, (L, W), 1)
                big[:, :] = x + jnp.where(iw == 0, tot, 0)

            elif variant in ("sync1", "sync4"):
                reps = 1 if variant == "sync1" else 4
                for r in range(reps):
                    xfer[:, :] = out[:, :] + r
                    s = xfer[0, 0]

                    @pl.when(s == -12345)
                    def _():
                        out[:, :] = out[:, :] * 2

            elif variant == "when8":
                xfer[:, :] = out[:, :]
                for l in range(L):
                    @pl.when(xfer[l, 0] == -12345)
                    def _(l=l):
                        out[:, :] = out[:, :] * 2

            elif variant in ("dma8", "dma8f", "dma2"):
                nl = 2 if variant == "dma2" else L
                gate = 12345 if variant == "dma8f" else 0
                xfer[:, :] = out[:, :] * 0 + (step & 63)
                for l in range(nl):
                    @pl.when(xfer[l, 0] >= gate)
                    def _(l=l):
                        pltpu.make_async_copy(
                            hbm.at[pl.ds(xfer[l, 0] + l, 1), :],
                            big.at[pl.ds(l, 1), 0:128],
                            sem.at[l],
                        ).start()
                for l in range(nl):
                    @pl.when(xfer[l, 0] >= gate)
                    def _(l=l):
                        pltpu.make_async_copy(
                            hbm.at[pl.ds(xfer[l, 0] + l, 1), :],
                            big.at[pl.ds(l, 1), 0:128],
                            sem.at[l],
                        ).wait()

            elif variant == "vv8":
                xfer[:, :] = out[:, :] * 0 + (step & 7)
                for l in range(L):
                    @pl.when(xfer[l, 0] >= 0)
                    def _(l=l):
                        pltpu.make_async_copy(
                            big.at[pl.ds(l, 1), 0:128],
                            big.at[pl.ds(l, 1), 128:256],
                            sem.at[l],
                        ).start()
                for l in range(L):
                    @pl.when(xfer[l, 0] >= 0)
                    def _(l=l):
                        pltpu.make_async_copy(
                            big.at[pl.ds(l, 1), 0:128],
                            big.at[pl.ds(l, 1), 128:256],
                            sem.at[l],
                        ).wait()

            return step + 1, acc

        jax.lax.while_loop(
            lambda c: c[0] < N, body, (jnp.int32(0), jnp.int32(0))
        )

    return kern


def run(variant):
    kern = make_kernel(variant)
    call = pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((L, 128), lambda g: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, 128), I32),
        scratch_shapes=[
            pltpu.VMEM((L, W), I32),
            pltpu.VMEM((L, 128), I32),
            pltpu.SemaphoreType.DMA((L,)),
        ],
    )
    hbm = jnp.arange(256 * 128, dtype=I32).reshape(256, 128)
    f = jax.jit(lambda h: call(h))
    t0 = time.time()
    r = jax.block_until_ready(f(hbm))
    tc = time.time() - t0
    ts = []
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(f(hbm))
        ts.append(time.time() - t0)
    dt = min(ts)
    return tc, dt


base = None
for v in ("empty", "vops32", "scan", "sync1", "sync4", "when8",
          "dma8", "dma8f", "dma2", "vv8"):
    try:
        tc, dt = run(v)
    except Exception as e:
        log(f"{v:8s} FAILED: {type(e).__name__}: {str(e)[:200]}")
        continue
    ns = dt / N * 1e9
    delta = "" if base is None else f"  delta {ns - base:8.1f} ns/iter"
    if v == "empty":
        base = ns
    log(f"{v:8s} compile {tc:5.1f}s  steady {dt*1e3:7.2f} ms  "
        f"{ns:8.1f} ns/iter{delta}")

log("done")
