"""Probe round 2: bisect the P3/P6/P7 compile crashes and measure the
in-kernel loop floor by NSTEPS slope (one dispatch costs ~38-70 ms through
the axon tunnel, so single-call timings are meaningless)."""

from __future__ import annotations

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


def check(name, fn):
    t0 = time.time()
    try:
        fn()
        print(f"[p2] {name}: PASS ({time.time()-t0:.1f}s)", flush=True)
    except Exception as e:
        print(f"[p2] {name}: FAIL ({time.time()-t0:.1f}s) "
              f"{type(e).__name__}: {str(e)[:200]}", flush=True)


# --- P3 bisect: u8 DMA dst variants ---------------------------------------

def _u8_dma(dst_mode):
    L, TB, SEGB = 8, 32 * 1024, 4096

    def kernel(starts_s, text_ref, out_ref, scr, sems):
        for l in range(L):
            if dst_mode == "flat":
                dst = scr.at[pl.ds(l * SEGB, SEGB)]
            else:
                dst = scr.at[l]
            pltpu.make_async_copy(
                text_ref.at[pl.ds(starts_s[l], SEGB)], dst, sems.at[l]
            ).start()
        for l in range(L):
            if dst_mode == "flat":
                dst = scr.at[pl.ds(l * SEGB, SEGB)]
            else:
                dst = scr.at[l]
            pltpu.make_async_copy(
                text_ref.at[pl.ds(starts_s[l], SEGB)], dst, sems.at[l]
            ).wait()
        if dst_mode == "flat":
            v = scr[:].reshape(L, SEGB)
        else:
            v = scr[:, :]
        out_ref[:, :] = v.astype(I32)

    rng = np.random.default_rng(0)
    text2d = rng.integers(0, 256, (L, TB), dtype=np.uint8)
    off = np.array([0, 1, 3, 7, 11, 13, 17, 27], np.int64) * 1024
    starts = (np.arange(L, dtype=np.int64) * TB + off).astype(np.int32)
    scr_shape = (
        pltpu.VMEM((L * SEGB,), U8) if dst_mode == "flat"
        else pltpu.VMEM((L, SEGB), U8)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[scr_shape, pltpu.SemaphoreType.DMA((L,))],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((L, SEGB), jnp.int32),
        interpret=INTERPRET,
    )(starts, text2d.reshape(L * TB))
    out = np.asarray(out)
    for l in range(L):
        assert (out[l] == text2d[l, off[l] : off[l] + SEGB]).all(), l


# --- P6 bisect: flush src/dst variants -------------------------------------

def _flush(src_mode):
    L, OW, FW = 8, 2048, 256

    def kernel(base_s, win_ref, out_ref, sems):
        for l in range(L):
            if src_mode == "row":
                src = win_ref.at[l, pl.ds(0, FW)]
            else:
                src = win_ref.at[pl.ds(l * 512, FW)]
            pltpu.make_async_copy(
                src, out_ref.at[pl.ds(base_s[l], FW)], sems.at[l]
            ).start()
        for l in range(L):
            if src_mode == "row":
                src = win_ref.at[l, pl.ds(0, FW)]
            else:
                src = win_ref.at[pl.ds(l * 512, FW)]
            pltpu.make_async_copy(
                src, out_ref.at[pl.ds(base_s[l], FW)], sems.at[l]
            ).wait()

    win = np.arange(L * 512, dtype=np.int32).reshape(L, 512)
    off = np.arange(L, dtype=np.int64) * FW
    base = (np.arange(L, dtype=np.int64) * OW + off).astype(np.int32)
    in_spec = (
        pl.BlockSpec(memory_space=pltpu.VMEM) if src_mode == "row"
        else pl.BlockSpec(memory_space=pltpu.VMEM)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[in_spec],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((L,))],
    )
    arg = win if src_mode == "row" else win.reshape(L * 512)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((L * OW,), jnp.int32),
        interpret=INTERPRET,
    )(base, arg)
    out = np.asarray(out).reshape(L, OW)
    for l in range(L):
        assert (out[l, off[l] : off[l] + FW] == win[l, :FW]).all(), l


# --- P7 bisect -------------------------------------------------------------

def _simple_vec_kernel(body):
    L, N = 8, 128

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:, :] = body(a_ref[:, :], b_ref[:, :])

    a = np.arange(1, L * N + 1, dtype=np.int32).reshape(L, N)
    b = (np.arange(L * N, dtype=np.int32).reshape(L, N) % 97) + 1
    return np.asarray(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, N), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )(a, b)), a, b


def p7a_clz():
    out, a, b = _simple_vec_kernel(
        lambda a, b: jax.lax.clz(a.astype(U32)).astype(I32)
    )
    want = np.array([[32 - int(x).bit_length() for x in row] for row in a])
    assert (out == want).all()


def p7b_fdiv_floor():
    out, a, b = _simple_vec_kernel(
        lambda a, b: jnp.floor(
            a.astype(jnp.float32) / b.astype(jnp.float32)
        ).astype(I32)
    )
    # i32->f32->div->floor->i32; check within 1 (rounding slop probe)
    want = a // b
    assert (np.abs(out - want) <= 1).all()
    print(f"[p2]   fdiv exact-floor mismatches: {(out != want).sum()}",
          flush=True)


def p7c_u32_mul_sub():
    out, a, b = _simple_vec_kernel(
        lambda a, b: (
            a.astype(U32) - (a.astype(U32) // 7) * jnp.uint32(7)
        ).astype(I32)
    )
    assert (out == a % 7).all()


def p7d_full_udiv():
    sys.path.insert(0, "/root/repo/experiments")
    from probe_mosaic import udiv_u32

    L, N = 8, 256

    def kernel(a_ref, b_ref, q_ref):
        q, _ = udiv_u32(a_ref[:, :].astype(U32), b_ref[:, :].astype(U32))
        q_ref[:, :] = q.astype(I32)

    rng = np.random.default_rng(1)
    a = rng.integers(0, 2**31 + 1, (L, N)).astype(np.uint32)
    b = rng.integers(1, 2**31, (L, N)).astype(np.uint32)
    b[2] = rng.integers(1, 64, (N,)).astype(np.uint32)
    b[3] = rng.integers(1, 2**22, (N,)).astype(np.uint32)
    a[4] = 2**31
    a[0, :4] = [0, 1, 2**31 - 1, 2**30]
    b[0, :4] = [1, 1, 1, 2**26 - 1]
    q = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, N), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )(a.astype(np.int32), b.astype(np.int32))
    assert (np.asarray(q).astype(np.uint32) == a // b).all()


def p7e_log2():
    out, a, b = _simple_vec_kernel(
        lambda a, b: (-jnp.log2(
            jnp.maximum(a.astype(jnp.float32) / 65536.0, 1e-38)
        ) * 65536.0).astype(I32)
    )
    want = (-np.log2(np.maximum(a.astype(np.float32) / 65536.0, 1e-38))
            * 65536.0).astype(np.int64)
    assert (np.abs(out - want) <= 16).all()


# --- floor slope -----------------------------------------------------------

def floor_slope(name, ndma, nvec):
    L, D, R = 8, 1024, 4096

    def make(nsteps):
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
                lambda c: c[0] < nsteps, body, (jnp.int32(0), jnp.int32(1))
            )
            o_ref[:, :] = acc[:, :]

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
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((L, 128), jnp.int32),
            interpret=INTERPRET,
        )

    planes = np.ones((L, D), np.int32)
    rows = np.ones((R, 128), np.int32)
    n1, n2 = (64, 512) if INTERPRET else (2048, 32768)
    f1, f2 = make(n1), make(n2)
    jax.block_until_ready(f1(planes, rows))
    jax.block_until_ready(f2(planes, rows))
    ts = []
    for f in (f1, f2):
        t0 = time.time()
        for _ in range(3):
            out = f(planes, rows)
        jax.block_until_ready(out)
        ts.append((time.time() - t0) / 3)
    slope = (ts[1] - ts[0]) / (n2 - n1) * 1e9
    print(f"[p2]   slope[{name}] ndma={ndma} nvec={nvec}: "
          f"{slope:.0f} ns/iter (t{n1}={ts[0]*1e3:.1f}ms "
          f"t{n2}={ts[1]*1e3:.1f}ms)", flush=True)


def main():
    print(f"[p2] backend={jax.default_backend()} interpret={INTERPRET}",
          flush=True)
    check("P3a_u8_flat_scr", lambda: _u8_dma("flat"))
    check("P3c_u8_row_scr", lambda: _u8_dma("row"))
    check("P6a_flush_rowsrc", lambda: _flush("row"))
    check("P6b_flush_flatsrc", lambda: _flush("flat"))
    check("P7a_clz", p7a_clz)
    check("P7b_fdiv_floor", p7b_fdiv_floor)
    check("P7c_u32_mul_sub", p7c_u32_mul_sub)
    check("P7d_full_udiv", p7d_full_udiv)
    check("P7e_log2", p7e_log2)
    check("F_empty", lambda: floor_slope("empty", 0, 0))
    check("F_vec8", lambda: floor_slope("vec8", 0, 8))
    check("F_dma1", lambda: floor_slope("dma1", 1, 8))
    check("F_dma8", lambda: floor_slope("dma8", 8, 8))
    check("F_dma16", lambda: floor_slope("dma16", 16, 8))


if __name__ == "__main__":
    main()
