"""Probe round 4: bisect the udiv round-computation compile crash (suspect:
u32 variable*variable multiply) and validate the final byte-per-i32 text
segment design end-to-end (DMA + barrel-shift extraction)."""

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
U32 = jnp.uint32
F32 = jnp.float32


def check(name, fn):
    t0 = time.time()
    try:
        fn()
        print(f"[p4] {name}: PASS ({time.time()-t0:.1f}s)", flush=True)
    except Exception as e:
        print(f"[p4] {name}: FAIL ({time.time()-t0:.1f}s) "
              f"{type(e).__name__}: {str(e)[:200]}", flush=True)


def _vec(body, check_fn):
    L, N = 8, 128

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:, :] = body(a_ref[:, :], b_ref[:, :])

    rng = np.random.default_rng(2)
    a = rng.integers(0, 2**31, (L, N)).astype(np.int32)
    b = rng.integers(2, 2**26, (L, N)).astype(np.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, N), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )(a, b)
    check_fn(np.asarray(out), a, b)


def m1_u32_mul():
    _vec(lambda a, b: (a.astype(U32) * b.astype(U32)).astype(I32),
         lambda o, a, b: np.testing.assert_array_equal(
             o.astype(np.uint32),
             a.astype(np.uint32) * b.astype(np.uint32)))


def m2_i32_mul():
    _vec(lambda a, b: a * b,
         lambda o, a, b: np.testing.assert_array_equal(o, a * b))


def imul_u32(x, y):
    """u32 product mod 2^32 via i32 multiply (bit-identical)."""
    return (x.astype(I32) * y.astype(I32)).astype(U32)


def f32_of_u32(x):
    lo = (x & jnp.uint32(0x7FFFFFFF)).astype(I32).astype(F32)
    hi = (x >> 31).astype(I32).astype(F32)
    return lo + hi * jnp.float32(2147483648.0)


def udiv_u32_v2(a, b):
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
        r = r - imul_u32(estu, bs)
    for _ in range(6):
        ge = (r >= bs).astype(U32)
        q = q + ge
        r = r - jnp.where(ge > 0, bs, 0)
    return jnp.where(is1, a, q), jnp.where(is1, jnp.uint32(0), r)


def m3_round1_imul():
    def body(a, b):
        au = a.astype(U32)
        bs = jnp.maximum(b.astype(U32), 2)
        bf = f32_of_u32(bs)
        C = jnp.float32(1.0 - 2.0 ** -16)
        est = jnp.maximum(jnp.floor(f32_of_u32(au) / bf * C) - 1.0, 0.0)
        estu = est.astype(I32).astype(U32)
        return (au - imul_u32(estu, bs)).astype(I32)

    _vec(body, lambda o, a, b: None)


def m4_udiv_imul():
    def body(a, b):
        q, _ = udiv_u32_v2(a, b)
        return q.astype(I32)

    def chk(o, a, b):
        np.testing.assert_array_equal(
            o.astype(np.uint32), a.astype(np.uint32) // b.astype(np.uint32)
        )

    _vec(body, chk)


def m4b_udiv_edge():
    """Edge cases: a = 2^31, b up to 2^31, tiny divisors."""
    L, N = 8, 256

    def kernel(a_ref, b_ref, q_ref):
        q, _ = udiv_u32_v2(a_ref[:, :].astype(U32), b_ref[:, :].astype(U32))
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


def t1_i32_text_seg():
    """Byte-per-i32 text rows: row-span DMA into 3D scratch, flatten via
    per-row copies, barrel-shift to the per-lane byte offset."""
    L, TROWS, SR = 8, 256, 20

    def kernel(r0_s, off_ref, text_ref, out_ref, scr, seg32, sems):
        for l in range(L):
            pltpu.make_async_copy(
                text_ref.at[pl.ds(r0_s[l], SR), :], scr.at[l], sems.at[l]
            ).start()
        for l in range(L):
            pltpu.make_async_copy(
                text_ref.at[pl.ds(r0_s[l], SR), :], scr.at[l], sems.at[l]
            ).wait()
        for r in range(SR):
            seg32[:, r * 128 : (r + 1) * 128] = scr[:, r, :]
        x = seg32[:, :]
        off = off_ref[:, :]
        N = SR * 128
        for bshift in range(7):
            bit = (off >> bshift) & 1
            rolled = pltpu.roll(x, N - (1 << bshift), axis=1)
            x = jnp.where(bit == 1, rolled, x)
        out_ref[:, :] = x

    rng = np.random.default_rng(0)
    textb = rng.integers(0, 256, (L, TROWS * 128), dtype=np.uint8)
    text32 = textb.astype(np.int32).reshape(L * TROWS, 128)
    p = np.array([0, 129, 300, 5000, 12345, 77, 1024, 32767 - SR * 128],
                 np.int64)
    r0 = (np.arange(L, dtype=np.int64) * TROWS + (p >> 7)).astype(np.int32)
    off = (p & 127).astype(np.int32)[:, None] * np.ones((1, 1), np.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((L, SR, 128), I32),
            pltpu.VMEM((L, SR * 128), I32),
            pltpu.SemaphoreType.DMA((L,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((L, SR * 128), jnp.int32),
        interpret=INTERPRET,
    )(r0, off, text32)
    out = np.asarray(out)
    W = SR * 128 - 128
    for l in range(L):
        want = textb[l, p[l] : p[l] + W].astype(np.int32)
        assert (out[l, :W] == want).all(), l


def main():
    print(f"[p4] backend={jax.default_backend()} interpret={INTERPRET}",
          flush=True)
    check("M1_u32_mul", m1_u32_mul)
    check("M2_i32_mul", m2_i32_mul)
    check("M3_round1_imul", m3_round1_imul)
    check("M4_udiv_imul", m4_udiv_imul)
    check("M4b_udiv_edge", m4b_udiv_edge)
    check("T1_i32_text_seg", t1_i32_text_seg)


if __name__ == "__main__":
    main()
