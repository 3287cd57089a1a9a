"""Mosaic primitive probes for the codec-VM kernel design.

Each probe is a tiny Pallas kernel exercising ONE pattern the codec-VM
(x3tpu/vm/) depends on, checked against a NumPy model.  Run with
--interpret for a CPU sanity pass; without it, the probes compile and run
on the real TPU in one process (first compile is slow; the rest are fast).

Patterns under test (see CLAUDE.md "Mosaic restrictions" for the known
failure modes that shaped them):

  P1 roll_select     per-lane barrel shift: pltpu.roll + [8,1] mask select
  P2 dyn_row_dma     HBM [R,128] i32 row-span DMA at dynamic index, + write
  P3 u8_seg_dma      HBM u8 row-slice DMA at dynamic 1024-aligned offset
  P4 scalar_while    while_loop w/ scalar carry + pl.when + nested fori
  P5 onehot_sink     one-hot scatter-add word write + VMEM scalar reads
  P6 vmem_flush      VMEM->HBM DMA at per-lane dynamic word offset
  P7 clz_div         lax.clz + exact u32 division via f32 estimate+fixup
  P8 event_floor     timing: per-iteration cost of an event-shaped body
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

INTERPRET = "--interpret" in sys.argv

import jax

if INTERPRET:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
U8 = jnp.uint8
U32 = jnp.uint32

RESULTS = []


def check(name, fn):
    t0 = time.time()
    try:
        fn()
        RESULTS.append((name, "PASS", time.time() - t0, ""))
        print(f"[probe] {name}: PASS ({time.time()-t0:.1f}s)", flush=True)
    except Exception as e:
        msg = f"{type(e).__name__}: {str(e)[:300]}"
        RESULTS.append((name, "FAIL", time.time() - t0, msg))
        print(f"[probe] {name}: FAIL ({time.time()-t0:.1f}s) {msg}", flush=True)


# ---------------------------------------------------------------------------
# P1: barrel shift (roll + masked select), [8, 9472] i32
# ---------------------------------------------------------------------------

def p1_roll_select():
    L, N = 8, 9472

    def kernel(x_ref, off_ref, o_ref):
        x = x_ref[:, :]
        off = off_ref[:, :]  # [8, 1] i32 in [0, 1024)
        for b in range(10):
            bit = (off >> b) & 1
            rolled = pltpu.roll(x, N - (1 << b), axis=1)  # left-shift by 2^b
            x = jnp.where(bit == 1, rolled, x)
        o_ref[:, :] = x

    x = np.arange(L * N, dtype=np.int32).reshape(L, N) % 251
    off = np.array([[0], [1], [7], [128], [513], [1023], [64], [999]], np.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, N), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )(x, off)
    out = np.asarray(out)
    for l in range(L):
        k = int(off[l, 0])
        want = np.roll(x[l], -k)
        valid = N - 1024
        assert (out[l, :valid] == want[:valid]).all(), f"lane {l} mismatch"


# ---------------------------------------------------------------------------
# P2: dynamic-row HBM DMA (read span of 16 rows per lane, modify, write 1)
# ---------------------------------------------------------------------------

def p2_dyn_row_dma():
    L, R, PB = 8, 256, 16

    def kernel(rows_s, hbm_ref, out_ref, scr, sems, wsem):
        for l in range(L):
            pltpu.make_async_copy(
                hbm_ref.at[pl.ds(rows_s[l], PB), :], scr.at[l], sems.at[l]
            ).start()
        for l in range(L):
            pltpu.make_async_copy(
                hbm_ref.at[pl.ds(rows_s[l], PB), :], scr.at[l], sems.at[l]
            ).wait()
        scr[:, 0, :] = scr[:, 0, :] + 1000
        # write row 0 of each span back at a dynamic index
        for l in range(L):
            pltpu.make_async_copy(
                scr.at[l, pl.ds(0, 1), :],
                out_ref.at[pl.ds(rows_s[l], 1), :],
                wsem.at[l],
            ).start()
        for l in range(L):
            pltpu.make_async_copy(
                scr.at[l, pl.ds(0, 1), :],
                out_ref.at[pl.ds(rows_s[l], 1), :],
                wsem.at[l],
            ).wait()

    rows = np.array([0, 16, 35, 64, 100, 128, 200, 240 - PB], np.int32)
    hbm = np.arange(R * 128, dtype=np.int32).reshape(R, 128)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((L, PB, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((L,)),
            pltpu.SemaphoreType.DMA((L,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
        input_output_aliases={1: 0},
        interpret=INTERPRET,
    )(rows, hbm)
    out = np.asarray(out)
    want = hbm.copy()
    for l in range(L):
        want[rows[l]] += 1000
    assert (out == want).all()


# ---------------------------------------------------------------------------
# P3: u8 row-slice DMA at dynamic 1024-aligned offset
# ---------------------------------------------------------------------------

def p3_u8_seg_dma():
    """Flattened-1D u8 text (the round-1 gather-kernel pattern): per-lane
    DMA at dynamic 1024-aligned offset with 1024-multiple size."""
    L, TB, SEGB = 8, 32 * 1024, 4096

    def kernel(starts_s, text_ref, out_ref, scr, sems):
        for l in range(L):
            pltpu.make_async_copy(
                text_ref.at[pl.ds(starts_s[l], SEGB)], scr.at[l], sems.at[l]
            ).start()
        for l in range(L):
            pltpu.make_async_copy(
                text_ref.at[pl.ds(starts_s[l], SEGB)], scr.at[l], sems.at[l]
            ).wait()
        out_ref[:, :] = scr[:, :]

    rng = np.random.default_rng(0)
    text2d = rng.integers(0, 256, (L, TB), dtype=np.uint8)
    text = text2d.reshape(L * TB)
    off = np.array([0, 1, 3, 7, 11, 13, 17, 27], np.int64) * 1024
    starts = (np.arange(L, dtype=np.int64) * TB + off).astype(np.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((L, SEGB), jnp.uint8),
            pltpu.SemaphoreType.DMA((L,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((L, SEGB), jnp.uint8),
        interpret=INTERPRET,
    )(starts, text)
    out = np.asarray(out)
    for l in range(L):
        assert (out[l] == text2d[l, off[l] : off[l] + SEGB]).all(), l


# ---------------------------------------------------------------------------
# P4: scalar-carry while loop + pl.when + nested fori
# ---------------------------------------------------------------------------

def p4_scalar_while():
    L = 8

    def kernel(x_ref, o_ref, acc):
        acc[:, :] = x_ref[:, :]

        def cond(c):
            step, tot = c
            return (step < 50) & (tot < 100000)

        def body(c):
            step, tot = c

            @pl.when(step % 2 == 0)
            def _():
                acc[:, :] = acc[:, :] * 2 + 1

            @pl.when(step % 2 != 0)
            def _():
                acc[:, :] = acc[:, :] - 1

            def fb(i, t):
                return t + jnp.sum(acc[:, 0:1]).astype(I32)

            tot = jax.lax.fori_loop(0, 2, fb, tot)
            return step + 1, tot

        step, tot = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.int32(0))
        )
        o_ref[:, :] = acc[:, :] + step + tot * 0

    x = np.ones((L, 128), np.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((L, 128), jnp.int32)],
        interpret=INTERPRET,
    )(x)
    # model
    acc = x.copy().astype(np.int64)
    tot = 0
    step = 0
    while step < 50 and tot < 100000:
        acc = acc * 2 + 1 if step % 2 == 0 else acc - 1
        tot += 2 * int(acc[:, 0].sum())
        step += 1
    want = acc + step
    assert (np.asarray(out) == want).all()


# ---------------------------------------------------------------------------
# P5: one-hot word write + VMEM scalar reads
# ---------------------------------------------------------------------------

def p5_onehot_sink():
    L, W = 8, 256

    def kernel(vals_ref, idx_ref, o_ref, win):
        win[:, :] = jnp.zeros((L, W), I32)
        iota = jax.lax.broadcasted_iota(I32, (L, W), 1)
        for k in range(4):
            v = vals_ref[:, k : k + 1]
            widx = idx_ref[:, k : k + 1]
            win[:, :] = win[:, :] + jnp.where(iota == widx, v, 0)
        # scalar read back of lane 3's word idx_ref[3, 0]
        c = idx_ref[3, 0]
        s = win[3, c]
        o_ref[:, :] = win[:, :] + (s - s)

    vals = np.arange(1, 33, dtype=np.int32).reshape(L, 4)
    idx = (np.arange(32, dtype=np.int32).reshape(L, 4) * 7) % W
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, W), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((L, W), jnp.int32)],
        interpret=INTERPRET,
    )(vals, idx)
    want = np.zeros((L, W), np.int32)
    for l in range(L):
        for k in range(4):
            want[l, idx[l, k]] += vals[l, k]
    assert (np.asarray(out) == want).all()


# ---------------------------------------------------------------------------
# P6: VMEM->HBM flush at per-lane dynamic word offset (128-word granular)
# ---------------------------------------------------------------------------

def p6_vmem_flush():
    """Flattened-1D i32 output stream: per-lane 256-word (1 KiB) flush DMA
    from a VMEM window row at a dynamic 256-word-aligned offset."""
    L, OW, FW = 8, 2048, 256

    def kernel(base_s, win_ref, out_ref, sems):
        for l in range(L):
            pltpu.make_async_copy(
                win_ref.at[l, pl.ds(0, FW)],
                out_ref.at[pl.ds(base_s[l], FW)],
                sems.at[l],
            ).start()
        for l in range(L):
            pltpu.make_async_copy(
                win_ref.at[l, pl.ds(0, FW)],
                out_ref.at[pl.ds(base_s[l], FW)],
                sems.at[l],
            ).wait()

    win = np.arange(L * 512, dtype=np.int32).reshape(L, 512)
    off = np.array([0, 1, 2, 3, 4, 5, 6, 7], np.int64) * FW
    base = (np.arange(L, dtype=np.int64) * OW + off).astype(np.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((L,))],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((L * OW,), jnp.int32),
        interpret=INTERPRET,
    )(base, win)
    out = np.asarray(out).reshape(L, OW)
    for l in range(L):
        got = out[l, off[l] : off[l] + FW]
        assert (got == win[l, :FW]).all(), l


# ---------------------------------------------------------------------------
# P7: clz + exact u32 division (f32 estimate + fixup)
# ---------------------------------------------------------------------------

def f32_of_u32(x):
    """Mosaic has no u32->f32 cast: split off the top bit, cast via i32."""
    lo = (x & jnp.uint32(0x7FFFFFFF)).astype(I32).astype(jnp.float32)
    hi = (x >> 31).astype(I32).astype(jnp.float32)
    return lo + hi * jnp.float32(2147483648.0)


def udiv_u32(a, b):
    """Exact floor(a / b) for u32 a <= 2^31, b in [1, 2^31].

    f32 estimate scaled down by (1 - 2^-16) — an under-estimate even if the
    hardware f32 divide is a few ulp off — exact u32 remainder, geometric
    convergence over 4 rounds, bounded fixup.  b == 1 short-circuits (its
    quotient can exceed the i32 range of the f32->int cast)."""
    a = a.astype(U32)
    b = b.astype(U32)
    is1 = b <= 1
    bs = jnp.maximum(b, 2)
    bf = f32_of_u32(bs)
    C = jnp.float32(1.0 - 2.0 ** -16)
    q = jnp.zeros_like(a)
    r = a
    for _ in range(4):
        est = jnp.maximum(jnp.floor(f32_of_u32(r) / bf * C) - 1.0, 0.0)
        estu = est.astype(I32).astype(U32)
        q = q + estu
        r = r - estu * bs
    for _ in range(6):
        ge = (r >= bs).astype(U32)
        q = q + ge
        r = r - ge * bs
    return jnp.where(is1, a, q), jnp.where(is1, jnp.uint32(0), r)


def p7_clz_div():
    L, N = 8, 128

    def kernel(a_ref, b_ref, q_ref, c_ref):
        a = a_ref[:, :].astype(U32)
        b = b_ref[:, :].astype(U32)
        q, _ = udiv_u32(a, b)
        q_ref[:, :] = q.astype(I32)
        c_ref[:, :] = jax.lax.clz(a).astype(I32)

    rng = np.random.default_rng(1)
    a = rng.integers(0, 2**31 + 1, (L, N)).astype(np.uint32)
    b = rng.integers(1, 2**31, (L, N)).astype(np.uint32)
    b[2] = rng.integers(1, 64, (N,)).astype(np.uint32)     # small divisors
    b[3] = rng.integers(1, 2**22, (N,)).astype(np.uint32)  # model totals
    a[4] = 2**31                                           # full AC range
    a[0, :4] = [0, 1, 2**31 - 1, 2**30]
    b[0, :4] = [1, 1, 1, 2**26 - 1]
    q, c = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((L, N), jnp.int32)] * 2,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        interpret=INTERPRET,
    )(a.astype(np.int32), b.astype(np.int32))
    assert (np.asarray(q).astype(np.uint32) == a // b).all(), "div mismatch"
    want_clz = np.array(
        [[32 - int(x).bit_length() for x in row] for row in a], np.int32
    )
    assert (np.asarray(c) == want_clz).all(), "clz mismatch"


# ---------------------------------------------------------------------------
# P8: event-shaped body timing (vector ops + 2 row DMAs per iteration)
# ---------------------------------------------------------------------------

def _floor_variant(name, ndma, nvec, NSTEPS=2048):
    """Time one while-loop iteration with ``ndma`` per-lane row DMAs and
    ``nvec`` probe-like vector passes over [8, 1024]."""
    L, D, R = 8, 1024, 4096

    def kernel(planes_ref, rows_hbm, o_ref, row_scr, sems, acc):
        acc[:, :] = jnp.zeros((L, 128), I32)

        def body(c):
            step, seed = c
            for l in range(ndma):
                pltpu.make_async_copy(
                    rows_hbm.at[pl.ds((seed + l * 17) % (R - 1), 1), :],
                    row_scr.at[l],
                    sems.at[l],
                ).start()
            x = planes_ref[:, :]
            t = acc[:, 0:1]
            for w in range(nvec):
                sl = x[:, (w % 8) * (D // 8) : ((w % 8) + 1) * (D // 8)]
                m = (sl == t).astype(I32)
                acc[:, :] = acc[:, :] + jnp.sum(
                    m, axis=1, keepdims=True
                ) * jnp.ones((L, 128), I32)
            for l in range(ndma):
                pltpu.make_async_copy(
                    rows_hbm.at[pl.ds((seed + l * 17) % (R - 1), 1), :],
                    row_scr.at[l],
                    sems.at[l],
                ).wait()
            if ndma:
                acc[:, :] = acc[:, :] + row_scr[:, 0, :]
            return step + 1, (seed * 5 + 1) % 65536

        jax.lax.while_loop(
            lambda c: c[0] < NSTEPS, body, (jnp.int32(0), jnp.int32(1))
        )
        o_ref[:, :] = acc[:, :]

    planes = np.ones((L, D), np.int32)
    rows = np.ones((R, 128), np.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((L, 1, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((max(ndma, 1),)),
            pltpu.VMEM((L, 128), jnp.int32),
        ],
    )
    f = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((L, 128), jnp.int32),
        interpret=INTERPRET,
    )
    out = f(planes, rows)
    jax.block_until_ready(out)
    t0 = time.time()
    out = f(planes, rows)
    jax.block_until_ready(out)
    dt = time.time() - t0
    print(f"[probe]   floor[{name}] ndma={ndma} nvec={nvec}: "
          f"{dt/NSTEPS*1e6:.2f} us/iter", flush=True)


def p8_event_floor():
    _floor_variant("empty", 0, 0)
    _floor_variant("vec8", 0, 8)
    _floor_variant("vec32", 0, 32)
    _floor_variant("dma1", 1, 8)
    _floor_variant("dma4", 4, 8)
    _floor_variant("dma8", 8, 8)


def main():
    print(f"[probe] backend={jax.default_backend()} interpret={INTERPRET}",
          flush=True)
    check("P1_roll_select", p1_roll_select)
    check("P2_dyn_row_dma", p2_dyn_row_dma)
    check("P3_u8_seg_dma", p3_u8_seg_dma)
    check("P4_scalar_while", p4_scalar_while)
    check("P5_onehot_sink", p5_onehot_sink)
    check("P6_vmem_flush", p6_vmem_flush)
    check("P7_clz_div", p7_clz_div)
    check("P8_event_floor", p8_event_floor)
    nfail = sum(1 for r in RESULTS if r[1] == "FAIL")
    print(f"[probe] done: {len(RESULTS)-nfail}/{len(RESULTS)} pass", flush=True)
    return 1 if nfail else 0


if __name__ == "__main__":
    raise SystemExit(main())
