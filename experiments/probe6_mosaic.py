"""Probe round 6: why does udiv_u32 + sink_put_bits crash the Mosaic
remote compiler (exit code 1) when each alone passes?  Hypotheses:
 (a) program size / register pressure (test truncated round counts and
     dummy chains of equal length),
 (b) a specific op pair (test chains with subsets of the division ops),
 (c) unroll vs fori_loop structure.
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

sys.path.insert(0, "/root/repo")
from x3tpu.vm import prims

I32 = jnp.int32
U32 = jnp.uint32
L = 8

RNG = np.random.default_rng(6)
A = RNG.integers(0, 2**31, (L, 128)).astype(np.int32)
B = RNG.integers(1, 2**31, (L, 128)).astype(np.int32)


def check(name, fn):
    t0 = time.time()
    try:
        fn()
        print(f"[p6] {name}: PASS ({time.time()-t0:.1f}s)", flush=True)
    except Exception as e:
        print(f"[p6] {name}: FAIL ({time.time()-t0:.1f}s) "
              f"{type(e).__name__}: {str(e)[:200]}", flush=True)


def _sink_kernel(chain_fn, W2=512):
    """Kernel = chain_fn(a, b) -> scr + one sink_put_bits."""

    def kernel(a_ref, b_ref, o_ref, scr):
        a = a_ref[:, 0:1]
        b = b_ref[:, 0:1] | 1
        scr[:, 0:1] = chain_fn(a.astype(U32), b.astype(U32)).astype(I32)
        win = jnp.zeros((L, W2), I32)
        nbits = jnp.zeros((L, 1), I32)
        base = jnp.zeros((L, 1), I32)
        act = jnp.ones((L, 1), jnp.bool_)
        win, nbits = prims.sink_put_bits(
            win, nbits, base, a.astype(U32), b & 31, act
        )
        o_ref[:, :] = win + scr[:, 0:1] * 0 + nbits * 0

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, W2), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((L, 128), jnp.int32)],
        interpret=INTERPRET,
    )(A, B)
    np.asarray(out)


def udiv_rounds(n):
    def chain(a, b):
        q = jnp.zeros_like(a)
        r = jnp.zeros_like(a)
        for i in range(31, 31 - n, -1):
            r = (r << 1) | ((a >> i) & 1)
            ge = r >= b
            r = r - jnp.where(ge, b, 0)
            q = q | jnp.where(ge, jnp.uint32(1) << i, 0)
        return q + r

    return chain


def dummy_rounds(n):
    """Same shape of unroll, only shift/or/and/add — no compare/where."""

    def chain(a, b):
        q = jnp.zeros_like(a)
        r = jnp.zeros_like(a)
        for i in range(31, 31 - n, -1):
            r = (r << 1) | ((a >> i) & 1)
            r = r + (b & jnp.uint32(3))
            q = q | (r & (jnp.uint32(1) << i))
        return q + r

    return chain


def cmp_rounds(n):
    """Unroll with uge + where-sub but no or-accumulate."""

    def chain(a, b):
        r = a
        for i in range(n):
            ge = r >= b
            r = (r - jnp.where(ge, b, 0)) | ((a >> (i & 31)) & 1)
        return r

    return chain


def fori_udiv(a, b):
    """Restoring division as fori_loop with vector carries + dyn shifts."""

    def body(k, c):
        q, r = c
        i = (31 - k).astype(U32)
        r = (r << 1) | ((a >> i) & 1)
        ge = r >= b
        r = r - jnp.where(ge, b, 0)
        q = q | jnp.where(ge, jnp.uint32(1) << i, jnp.uint32(0))
        return q, r

    q, r = jax.lax.fori_loop(
        0, 32, body, (jnp.zeros_like(a), jnp.zeros_like(a))
    )
    return q + r


def _combo_kernel(use_udiv, use_imul, use_renorm, use_clz, W2=512):
    def kernel(a_ref, b_ref, o_ref, scr):
        a = a_ref[:, 0:1].astype(U32)
        b = (b_ref[:, 0:1] | 1).astype(U32)
        acc = jnp.zeros((L, 1), I32)
        if use_udiv:
            q, r = prims.udiv_u32(a, b)
            acc = acc + q.astype(I32) + r.astype(I32)
        if use_imul:
            acc = acc + prims.imul_u32(a, b).astype(I32)
        if use_clz:
            acc = acc + prims.clz32(a ^ b)
        if use_renorm:
            n, v, lo2, hi2, m = prims.ac_enc_renorm_counts(
                a & jnp.uint32(0x3FFFFFFF), (a | 1) & jnp.uint32(0x7FFFFFFF))
            acc = acc + n + m + v.astype(I32) + lo2.astype(I32) + hi2.astype(I32)
        scr[:, 0:1] = acc
        win = jnp.zeros((L, W2), I32)
        nbits = jnp.zeros((L, 1), I32)
        base = jnp.zeros((L, 1), I32)
        act = jnp.ones((L, 1), jnp.bool_)
        win, nbits = prims.sink_put_bits(
            win, nbits, base, a, b_ref[:, 0:1] & 31, act
        )
        o_ref[:, :] = win + scr[:, 0:1] * 0 + nbits * 0

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, W2), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((L, 128), jnp.int32)],
        interpret=INTERPRET,
    )(A, B)
    np.asarray(out)


def run_u_probes():
    check("U1_udiv_clz_sink", lambda: _combo_kernel(1, 0, 0, 1))
    check("U2_udiv_renorm_sink", lambda: _combo_kernel(1, 0, 1, 0))
    check("U3_udiv_imul_sink", lambda: _combo_kernel(1, 1, 0, 0))
    check("U4_imul_renorm_sink", lambda: _combo_kernel(0, 1, 1, 0))
    check("U5_udiv_imul_renorm_sink", lambda: _combo_kernel(1, 1, 1, 0))


if __name__ == "__main__":
    for n in (4, 8, 16, 24, 32):
        check(f"T1_udiv_{n}_rounds", lambda n=n: _sink_kernel(udiv_rounds(n)))
    for n in (16, 32):
        check(f"T2_dummy_{n}_rounds", lambda n=n: _sink_kernel(dummy_rounds(n)))
    for n in (16, 32):
        check(f"T3_cmp_{n}_rounds", lambda n=n: _sink_kernel(cmp_rounds(n)))
    check("T4_fori_udiv", lambda: _sink_kernel(fori_udiv))
    run_u_probes()
    check("T5_udiv32_smallwin",
          lambda: _sink_kernel(udiv_rounds(32), W2=128))




def _combo2_kernel(nrounds, use_imul, use_clz, use_renorm, W2=512,
                   extra_add=False):
    def kernel(a_ref, b_ref, o_ref, scr):
        a = a_ref[:, 0:1].astype(U32)
        b = (b_ref[:, 0:1] | 1).astype(U32)
        acc = jnp.zeros((L, 1), I32)
        if nrounds:
            q = jnp.zeros_like(a)
            r = jnp.zeros_like(a)
            for i in range(31, 31 - nrounds, -1):
                r = (r << 1) | ((a >> i) & 1)
                ge = r >= b
                r = r - jnp.where(ge, b, 0)
                q = q | jnp.where(ge, jnp.uint32(1) << i, 0)
            acc = acc + q.astype(I32) + r.astype(I32)
        if use_imul:
            acc = acc + prims.imul_u32(a, b).astype(I32)
        if use_clz:
            acc = acc + prims.clz32(a ^ b)
        if use_renorm:
            n, v, lo2, hi2, m = prims.ac_enc_renorm_counts(
                a & jnp.uint32(0x3FFFFFFF), (a | 1) & jnp.uint32(0x7FFFFFFF))
            acc = acc + n + m + v.astype(I32) + lo2.astype(I32) + hi2.astype(I32)
        if extra_add:
            acc = acc + (a + b).astype(I32)
        scr[:, 0:1] = acc
        win = jnp.zeros((L, W2), I32)
        nbits = jnp.zeros((L, 1), I32)
        base = jnp.zeros((L, 1), I32)
        act = jnp.ones((L, 1), jnp.bool_)
        win, nbits = prims.sink_put_bits(
            win, nbits, base, a, b_ref[:, 0:1] & 31, act
        )
        o_ref[:, :] = win + scr[:, 0:1] * 0 + nbits * 0

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, W2), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((L, 128), jnp.int32)],
        interpret=INTERPRET,
    )(A, B)
    np.asarray(out)


if __name__ == "__main__" and "--v" in sys.argv:
    check("V1_udiv16_all_sink", lambda: _combo2_kernel(16, 1, 1, 1))
    check("V2_udiv24_imul_sink", lambda: _combo2_kernel(24, 1, 0, 0))
    check("V3_udiv28_imul_sink", lambda: _combo2_kernel(28, 1, 0, 0))
    check("V4_udiv32_add_sink",
          lambda: _combo2_kernel(32, 0, 0, 0, extra_add=True))
    check("V5_udiv32_imul_sink128", lambda: _combo2_kernel(32, 1, 0, 0, W2=128))
