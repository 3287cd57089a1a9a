"""Cost model of the codec-VM event loop's building blocks on real TPU.

Each variant is a tiny Pallas kernel with a scalar-carried while_loop of N
iterations; the body exercises ONE cost class and every intermediate feeds
the kernel output (v1 of this probe was silently DCE'd: scratch writes do
not escape, and constant folding collapsed the op chains).
(time_variant - time_empty) / N = per-iteration cost of that class.

  empty      loop + 1 dependent vector op              (baseline)
  vops32     + 32 chained non-foldable [8,128] ops     (small-tile op cost)
  scan       + 31x2 dependent ops on [8,8192]          (window-scan class)
  sync4      + 4 vector->scalar handoffs w/ live pred  (pipeline sync cost)
  when8      + 8 per-lane pl.when, live pred, live body(branch cost)
  dma1       + 1-lane 1-row HBM->VMEM start+wait, used (single DMA latency)
  dma8       + 8-lane version, batched start then wait (overlapped DMAs)
  dma8pb     + 8-lane PB=16-row copies                 (promoted-span DMA)
  dma8f      + 8-lane gated out (pred false)           (gated-out DMA cost)
  wb8        + 8-lane VMEM->HBM 1-row writeback        (writeback DMA)

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
PB = 16
I32 = jnp.int32
T0 = time.time()


def log(msg):
    print(f"[probe9 +{time.time()-T0:6.1f}s] {msg}", flush=True)


def iotac(w):
    return jax.lax.broadcasted_iota(I32, (L, w), 1)


def make_kernel(variant):
    def kern(hbm, out, big, row3, row1, xfer, sem, semw, *, variant=variant):
        out[:, :] = jnp.zeros((L, 128), I32)
        big[:, :] = iotac(W)

        def body(carry):
            step, acc = carry
            x = out[:, :] + 1

            if variant == "vops32":
                for i in range(32):
                    x = x ^ (x >> 1) | (i + 1)

            elif variant == "scan":
                b = big[:, :]
                run = b != x[:, 0:1]
                tot = jnp.zeros((L, 1), I32)
                for i in range(31):
                    run = run & (b >= x[:, 1:2] - i)
                    tot = tot + jnp.sum(run.astype(I32), axis=1,
                                        keepdims=True)
                x = x + jnp.where(iotac(128) == 0, tot, 0)

            elif variant == "sync4":
                for r in range(4):
                    xfer[:, :] = x + r
                    s = xfer[0, 0]

                    @pl.when(s > 0)
                    def _():
                        out[:, :] = out[:, :] | 1
                    x = x + out[:, 0:1]

            elif variant == "when8":
                xfer[:, :] = x
                for l in range(L):
                    @pl.when(xfer[l, 0] > 0)
                    def _(l=l):
                        out[:, :] = out[:, :] | (l + 1)
                x = x + out[:, 0:1]

            elif variant in ("dma1", "dma8", "dma8pb", "dma8f"):
                nl = 1 if variant == "dma1" else L
                big_copy = variant == "dma8pb"
                nr = PB if big_copy else 1
                gate = (1 << 30) if variant == "dma8f" else 0
                dst = row3 if big_copy else row1
                xfer[:, :] = (x & 63) + gate
                for l in range(nl):
                    @pl.when(xfer[l, 0] < 128)
                    def _(l=l):
                        pltpu.make_async_copy(
                            hbm.at[pl.ds(xfer[l, 0], nr), :],
                            dst.at[l],
                            sem.at[l],
                        ).start()
                for l in range(nl):
                    @pl.when(xfer[l, 0] < 128)
                    def _(l=l):
                        pltpu.make_async_copy(
                            hbm.at[pl.ds(xfer[l, 0], nr), :],
                            dst.at[l],
                            sem.at[l],
                        ).wait()
                x = x + dst[:, 0, 0:1]

            out[:, :] = x
            return step + 1, acc

        jax.lax.while_loop(
            lambda c: c[0] < N, body, (jnp.int32(0), jnp.int32(0))
        )

    return kern


def make_kernel_wb():
    def kern(hbm, out, hbm_out, big, row3, row1, xfer, sem, semw):
        out[:, :] = jnp.zeros((L, 128), I32)
        big[:, :] = iotac(W)

        def body(carry):
            step, acc = carry
            x = out[:, :] + 1
            xfer[:, :] = x & 63
            row1[:, 0, :] = x[:, :]
            for l in range(L):
                @pl.when(xfer[l, 0] < 128)
                def _(l=l):
                    pltpu.make_async_copy(
                        row1.at[l],
                        hbm_out.at[pl.ds(xfer[l, 0] + l, 1), :],
                        semw.at[l],
                    ).start()
            for l in range(L):
                @pl.when(xfer[l, 0] < 128)
                def _(l=l):
                    pltpu.make_async_copy(
                        row1.at[l],
                        hbm_out.at[pl.ds(xfer[l, 0] + l, 1), :],
                        semw.at[l],
                    ).wait()
            out[:, :] = x
            return step + 1, acc

        jax.lax.while_loop(
            lambda c: c[0] < N, body, (jnp.int32(0), jnp.int32(0))
        )

    return kern


def run(variant):
    hbm = jnp.arange(256 * 128, dtype=I32).reshape(256, 128)
    scratch = [
        pltpu.VMEM((L, W), I32),
        pltpu.VMEM((L, PB, 128), I32),
        pltpu.VMEM((L, 1, 128), I32),
        pltpu.VMEM((L, 128), I32),
        pltpu.SemaphoreType.DMA((L,)),
        pltpu.SemaphoreType.DMA((L,)),
    ]
    if variant == "wb8":
        call = pl.pallas_call(
            make_kernel_wb(),
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[
                pl.BlockSpec((L, 128), lambda g: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((L, 128), I32),
                jax.ShapeDtypeStruct((256, 128), I32),
            ],
            scratch_shapes=scratch,
        )
        f = jax.jit(lambda h: call(h)[0])
    else:
        call = pl.pallas_call(
            make_kernel(variant),
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((L, 128), lambda g: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((L, 128), I32),
            scratch_shapes=scratch,
        )
        f = jax.jit(lambda h: call(h))
    # NB: block_until_ready through the axon tunnel does NOT wait for
    # device execution — only a value read does (probe9b diagnostic,
    # 2026-08-17: ~33 ms dispatch floor shows up only under device_get)
    t0 = time.time()
    jax.device_get(f(hbm))
    tc = time.time() - t0
    ts = []
    for _ in range(3):
        t0 = time.time()
        jax.device_get(f(hbm))
        ts.append(time.time() - t0)
    dt = min(ts)
    return tc, dt


base = None
for v in ("empty", "vops32", "scan", "sync4", "when8",
          "dma1", "dma8", "dma8pb", "dma8f", "wb8"):
    try:
        tc, dt = run(v)
    except Exception as e:
        log(f"{v:8s} FAILED: {type(e).__name__}: {str(e)[:160]}")
        continue
    ns = dt / N * 1e9
    delta = "" if base is None else f"  delta {ns - base:8.1f} ns/iter"
    if v == "empty":
        base = ns
    log(f"{v:8s} compile {tc:5.1f}s  steady {dt*1e3:7.2f} ms  "
        f"{ns:8.1f} ns/iter{delta}")

log("done")
