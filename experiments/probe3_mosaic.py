"""Probe round 3: the all-2D-row DMA design (rank-1 memref DMAs crash the
compiler on this stack — probe2).  Everything flows through [rows, 128]
HBM arrays and 3D VMEM scratch, the P2-validated pattern.

  A  u8 text rows: HBM [R,128] u8 row-span -> 3D u8 scratch -> widen to a
     flat [8, SR*128] i32 segment via per-row stores (no value reshape)
  A2 same, widening via a single astype+reshape (preferred if legal)
  B  the full VM pallas_call shape: grid over lane groups, blocked VMEM
     carried state + aliased ANY row arrays addressed by program_id,
     2-row staging DMA writes at dynamic row offsets
"""

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


def check(name, fn):
    t0 = time.time()
    try:
        fn()
        print(f"[p3] {name}: PASS ({time.time()-t0:.1f}s)", flush=True)
    except Exception as e:
        print(f"[p3] {name}: FAIL ({time.time()-t0:.1f}s) "
              f"{type(e).__name__}: {str(e)[:200]}", flush=True)


def _text_seg(widen):
    L, TROWS, SR = 8, 256, 20  # 32 KiB/lane text, 2.5 KiB segment

    def kernel(r0_s, text_ref, out_ref, scr, seg32, sems):
        for l in range(L):
            pltpu.make_async_copy(
                text_ref.at[pl.ds(r0_s[l], SR), :], scr.at[l], sems.at[l]
            ).start()
        for l in range(L):
            pltpu.make_async_copy(
                text_ref.at[pl.ds(r0_s[l], SR), :], scr.at[l], sems.at[l]
            ).wait()
        if widen == "perrow":
            for r in range(SR):
                seg32[:, r * 128 : (r + 1) * 128] = scr[:, r, :].astype(I32)
        else:
            seg32[:, :] = scr[:, :, :].astype(I32).reshape(L, SR * 128)
        out_ref[:, :] = seg32[:, :]

    rng = np.random.default_rng(0)
    text2d = rng.integers(0, 256, (L, TROWS * 128), dtype=np.uint8)
    r0 = (np.arange(L, dtype=np.int64) * TROWS
          + np.array([0, 1, 2, 5, 9, 33, 100, TROWS - SR])).astype(np.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((L, SR, 128), U8),
            pltpu.VMEM((L, SR * 128), I32),
            pltpu.SemaphoreType.DMA((L,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((L, SR * 128), jnp.int32),
        interpret=INTERPRET,
    )(r0, text2d.reshape(L * TROWS, 128))
    out = np.asarray(out)
    for l in range(L):
        o = (r0[l] - l * TROWS) * 128
        want = text2d[l, o : o + SR * 128].astype(np.int32)
        assert (out[l] == want).all(), l


def p3b_vm_shape():
    """Grid over 2 lane groups; carried VMEM state (blocked) + aliased ANY
    row array; per-lane single-row read DMA and 2-row staged write DMA at
    dynamic, program_id-dependent row offsets."""
    L, G, D, RPL = 8, 2, 512, 64  # RPL rows per lane
    G8 = G * L
    R = G8 * RPL

    def kernel(regs_in, rows_in, regs_out, rows_out, stage, rscr, sems):
        g = pl.program_id(0)
        regs_out[:, :] = regs_in[:, :] + 1
        # read one row per lane at a dynamic index derived from regs
        for l in range(L):
            ridx = (g * L + l) * RPL + regs_in[l, 0]
            pltpu.make_async_copy(
                rows_in.at[pl.ds(ridx, 1), :], rscr.at[l], sems.at[l]
            ).start()
        for l in range(L):
            ridx = (g * L + l) * RPL + regs_in[l, 0]
            pltpu.make_async_copy(
                rows_in.at[pl.ds(ridx, 1), :], rscr.at[l], sems.at[l]
            ).wait()
        # stage two rows and write them back one lane-row further
        stage[:, 0, :] = rscr[:, 0, :] * 2
        stage[:, 1, :] = rscr[:, 0, :] + 7
        for l in range(L):
            widx = (g * L + l) * RPL + regs_in[l, 0] + 1
            pltpu.make_async_copy(
                stage.at[l], rows_out.at[pl.ds(widx, 2), :], sems.at[l]
            ).start()
        for l in range(L):
            widx = (g * L + l) * RPL + regs_in[l, 0] + 1
            pltpu.make_async_copy(
                stage.at[l], rows_out.at[pl.ds(widx, 2), :], sems.at[l]
            ).wait()

    regs = np.tile(np.arange(G8, dtype=np.int32)[:, None] % 13, (1, 128))
    rows = np.arange(R * 128, dtype=np.int64).reshape(R, 128) % 1000
    rows = rows.astype(np.int32)
    out_regs, out_rows = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((L, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((L, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G8, 128), jnp.int32),
            jax.ShapeDtypeStruct((R, 128), jnp.int32),
        ],
        input_output_aliases={1: 1},
        scratch_shapes=[
            pltpu.VMEM((L, 2, 128), I32),
            pltpu.VMEM((L, 1, 128), I32),
            pltpu.SemaphoreType.DMA((L,)),
        ],
        interpret=INTERPRET,
    )(regs, rows)
    out_regs = np.asarray(out_regs)
    out_rows = np.asarray(out_rows)
    assert (out_regs == regs + 1).all()
    want = rows.copy()
    for gl in range(G8):
        base = gl * RPL + regs[gl, 0]
        want[base + 1] = rows[base] * 2
        want[base + 2] = rows[base] + 7
    assert (out_rows == want).all()


def _udiv_stage(stage):
    """Bisect the probe2 P7d compile crash."""
    L, N = 8, 128
    U32 = jnp.uint32
    F32 = jnp.float32

    def f32_of_u32(x):
        lo = (x & jnp.uint32(0x7FFFFFFF)).astype(I32).astype(F32)
        hi = (x >> 31).astype(I32).astype(F32)
        return lo + hi * jnp.float32(2147483648.0)

    def body(a, b):
        a = a.astype(U32)
        b = b.astype(U32)
        if stage == "cast":
            return (f32_of_u32(a) + f32_of_u32(b)).astype(I32)
        bs = jnp.maximum(b, 2)
        bf = f32_of_u32(bs)
        C = jnp.float32(1.0 - 2.0 ** -16)
        q = jnp.zeros_like(a)
        r = a
        rounds = 1 if stage == "round1" else 4
        for _ in range(rounds):
            est = jnp.maximum(jnp.floor(f32_of_u32(r) / bf * C) - 1.0, 0.0)
            estu = est.astype(I32).astype(U32)
            q = q + estu
            r = r - estu * bs
        if stage == "full":
            for _ in range(6):
                ge = (r >= bs).astype(U32)
                q = q + ge
                r = r - ge * bs
            q = jnp.where(b <= 1, a, q)
        return q.astype(I32)

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:, :] = body(a_ref[:, :], b_ref[:, :])

    rng = np.random.default_rng(1)
    a = rng.integers(0, 2**31, (L, N)).astype(np.int32)
    b = rng.integers(2, 2**26, (L, N)).astype(np.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, N), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )(a, b)
    if stage == "full":
        want = (a.astype(np.uint32) // b.astype(np.uint32)).astype(np.int32)
        assert (np.asarray(out) == want).all()


def main():
    print(f"[p3] backend={jax.default_backend()} interpret={INTERPRET}",
          flush=True)
    check("A_u8rows_perrow", lambda: _text_seg("perrow"))
    check("A2_u8rows_reshape", lambda: _text_seg("reshape"))
    check("B_vm_shape", p3b_vm_shape)
    check("D_udiv_cast", lambda: _udiv_stage("cast"))
    check("D_udiv_round1", lambda: _udiv_stage("round1"))
    check("D_udiv_full", lambda: _udiv_stage("full"))


if __name__ == "__main__":
    main()
