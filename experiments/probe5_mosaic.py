"""Probe round 5: bisect the codec-VM 'Unsupported target bitwidth for
truncation' Mosaic compile error.  Suspects (in kernel-entry order): the
(i32, bool) while-loop carry, bitrev32, mask_u32's vector shifts,
sink_put_bits, ac_enc_renorm_counts, full ac_encode."""

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


def check(name, fn):
    t0 = time.time()
    try:
        fn()
        print(f"[p5] {name}: PASS ({time.time()-t0:.1f}s)", flush=True)
    except Exception as e:
        print(f"[p5] {name}: FAIL ({time.time()-t0:.1f}s) "
              f"{type(e).__name__}: {str(e)[:300]}", flush=True)


def _run2(kernel, *arrs, n_out=1, out_w=128, f32=False):
    outs = [
        jax.ShapeDtypeStruct((L, out_w), jnp.float32 if f32 else jnp.int32)
        for _ in range(n_out)
    ]
    return pl.pallas_call(
        kernel,
        out_shape=outs if n_out > 1 else outs[0],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(arrs),
        out_specs=(
            [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_out
            if n_out > 1 else pl.BlockSpec(memory_space=pltpu.VMEM)
        ),
        interpret=INTERPRET,
    )(*arrs)


RNG = np.random.default_rng(5)
A = RNG.integers(0, 2**31, (L, 128)).astype(np.int32)
B = RNG.integers(1, 2**31, (L, 128)).astype(np.int32)


def s1_bool_while_carry():
    def kernel(a_ref, o_ref):
        def body(c):
            i, alive = c
            return i + 1, alive & (i < 5)

        def cond(c):
            i, alive = c
            return (i < 10) & alive

        i, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.bool_(True)))
        o_ref[:, :] = a_ref[:, :] + i

    out = _run2(kernel, A)
    np.testing.assert_array_equal(np.asarray(out), A + 6)


def s1b_i32_while_carry():
    def kernel(a_ref, o_ref):
        def body(c):
            i, alive = c
            return i + 1, alive & jnp.int32(i < 5)

        def cond(c):
            i, alive = c
            return (i < 10) & (alive != 0)

        i, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(1)))
        o_ref[:, :] = a_ref[:, :] + i

    out = _run2(kernel, A)
    np.testing.assert_array_equal(np.asarray(out), A + 6)


def s2_bitrev32():
    def kernel(a_ref, o_ref):
        o_ref[:, :] = prims.bitrev32(a_ref[:, :].astype(U32)).astype(I32)

    out = _run2(kernel, A)
    want = np.array(
        [int(f"{int(x) & 0xFFFFFFFF:032b}"[::-1], 2) for x in A.ravel()],
        np.uint64,
    ).reshape(L, 128).astype(np.uint32).view(np.int32)
    np.testing.assert_array_equal(np.asarray(out), want)


def s3_mask_u32():
    def kernel(a_ref, o_ref):
        cnt = a_ref[:, :] & 63
        o_ref[:, :] = prims.mask_u32(cnt).astype(I32)

    out = _run2(kernel, A)
    cnt = A & 63
    want = np.where(
        cnt >= 32, np.uint32(0xFFFFFFFF),
        (np.uint64(1) << cnt.astype(np.uint64)).astype(np.uint32) - 1,
    ).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(out), want)


def s4_sink_put_bits():
    W2 = 512

    def kernel(v_ref, c_ref, o_ref):
        win = jnp.zeros((L, W2), I32)
        nbits = jnp.zeros((L, 1), I32)
        base = jnp.zeros((L, 1), I32)
        act = jnp.ones((L, 1), jnp.bool_)
        for k in range(4):
            val = v_ref[:, k : k + 1]
            cnt = c_ref[:, k : k + 1] % 33
            win, nbits = prims.sink_put_bits(win, nbits, base, val, cnt, act)
        o_ref[:, :] = win

    v = RNG.integers(0, 2**31, (L, 4)).astype(np.int32)
    c = RNG.integers(0, 33, (L, 4)).astype(np.int32)
    out = np.asarray(_run2(kernel, v, c, out_w=W2))
    # host model
    for lane in range(L):
        bits = []
        for k in range(4):
            cnt = int(c[lane, k]) % 33
            for b in range(cnt):
                bits.append((int(v[lane, k]) >> b) & 1)
        words = np.zeros(W2, np.uint32)
        for i, bit in enumerate(bits):
            words[i // 32] |= np.uint32(bit) << (i % 32)
        np.testing.assert_array_equal(
            out[lane].astype(np.uint32), words, err_msg=f"lane {lane}"
        )


def s5_renorm_counts():
    def kernel(a_ref, b_ref, lo_ref, hi_ref, n_ref, m_ref):
        low = jnp.minimum(a_ref[:, :], b_ref[:, :]).astype(U32)
        high = jnp.maximum(a_ref[:, :], b_ref[:, :]).astype(U32) | 1
        n, v, low2, high2, m = prims.ac_enc_renorm_counts(low, high)
        lo_ref[:, :] = low2.astype(I32)
        hi_ref[:, :] = high2.astype(I32)
        n_ref[:, :] = n
        m_ref[:, :] = v.astype(I32) + m * 0

    outs = _run2(kernel, A, B, n_out=4)
    [np.asarray(o) for o in outs]


def s6_ac_encode_full():
    W2 = 512

    def kernel(lo_ref, sp_ref, o_ref, nb_ref):
        st = dict(
            low=jnp.zeros((L, 1), U32),
            high=jnp.full((L, 1), 0x7FFFFFFF, U32),
            scale=jnp.zeros((L, 1), I32),
            nbits=jnp.zeros((L, 1), I32),
            win_base=jnp.zeros((L, 1), I32),
            win=jnp.zeros((L, W2), I32),
            oflow=jnp.zeros((L, 1), jnp.bool_),
        )
        act = jnp.ones((L, 1), jnp.bool_)
        for k in range(3):
            low_f = lo_ref[:, k : k + 1] % 100
            span = sp_ref[:, k : k + 1] % 50 + 1
            tot = low_f + span + 37
            st = prims.ac_encode(st, low_f, span, tot, act)
        o_ref[:, :] = st["win"]
        nb_ref[:, :] = jnp.concatenate(
            [st["nbits"], st["low"].astype(I32), st["high"].astype(I32),
             st["scale"], jnp.zeros((L, 124), I32)], axis=1,
        )

    lo = RNG.integers(0, 1000, (L, 3)).astype(np.int32)
    sp = RNG.integers(0, 1000, (L, 3)).astype(np.int32)
    outs = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((L, 512), jnp.int32),
                   jax.ShapeDtypeStruct((L, 128), jnp.int32)],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        interpret=INTERPRET,
    )(lo, sp)
    got_win, got_nb = [np.asarray(o) for o in outs]
    # differential vs interpret handled by running with --interpret once
    print("      nbits:", got_nb[:, 0].tolist(), file=sys.stderr)


def _ac_state(W2=512):
    return dict(
        low=jnp.zeros((L, 1), U32),
        high=jnp.full((L, 1), 0x7FFFFFFF, U32),
        scale=jnp.zeros((L, 1), I32),
        nbits=jnp.zeros((L, 1), I32),
        win_base=jnp.zeros((L, 1), I32),
        win=jnp.zeros((L, 512), I32),
        oflow=jnp.zeros((L, 1), jnp.bool_),
    )


def _s6_variant(stage):
    """Partial ac_encode: 'interval' | 'renorm' | 'b0' | 'run' | 'tail'
    | 'noudiv' (full, udiv replaced by shift)."""

    def kernel(lo_ref, sp_ref, o_ref):
        st = _ac_state()
        act = jnp.ones((L, 1), jnp.bool_)
        for k in range(3):
            low_f = lo_ref[:, k : k + 1] % 100
            span = sp_ref[:, k : k + 1] % 50 + 1
            total = low_f + span + 37
            total_s = jnp.maximum(total.astype(U32), 1)
            if stage == "noudiv":
                step = (st["high"] - st["low"] + 1) >> 9
            else:
                step, _ = prims.udiv_u32(
                    st["high"] - st["low"] + 1, total_s
                )
            high = st["low"] + prims.imul_u32(
                step, (low_f + span).astype(U32)) - 1
            low = st["low"] + prims.imul_u32(step, low_f.astype(U32))
            if stage == "interval":
                st = dict(st, low=low, high=high)
                continue
            n, v, low2, high2, m = prims.ac_enc_renorm_counts(low, high)
            n = jnp.where(act, n, 0)
            emit = act & (n > 0)
            win, nbits = st["win"], st["nbits"]
            if stage != "renorm":
                b0 = (v >> jnp.maximum(n - 1, 0).astype(U32)) & 1
                win, nbits = prims.sink_put_bits(
                    win, nbits, st["win_base"], b0,
                    jnp.where(emit, 1, 0), emit,
                )
            if stage in ("run", "tail", "noudiv"):
                rb = (b0 & 1) ^ 1
                left = jnp.where(emit, st["scale"], 0)
                for _ in range(prims.AC_RUN_CHUNKS):
                    chunk = jnp.clip(left, 0, 31)
                    pat = jnp.where(rb == 1, prims.mask_u32(chunk),
                                    jnp.uint32(0))
                    do = emit & (chunk > 0)
                    win, nbits = prims.sink_put_bits(
                        win, nbits, st["win_base"], pat, chunk, do
                    )
                    left = left - chunk
            if stage in ("tail", "noudiv"):
                tail_n = jnp.maximum(n - 1, 0)
                tail = v & prims.mask_u32(tail_n)
                sh = (jnp.uint32(32) - tail_n.astype(U32)) & 31
                tail_rev = jnp.where(
                    tail_n > 0, prims.bitrev32(tail) >> sh, 0
                )
                win, nbits = prims.sink_put_bits(
                    win, nbits, st["win_base"], tail_rev, tail_n, emit
                )
            st = dict(
                st, low=low2, high=high2,
                scale=jnp.where(emit, m, st["scale"] + m),
                win=win, nbits=nbits,
            )
        o_ref[:, :] = st["win"]

    lo = RNG.integers(0, 1000, (L, 3)).astype(np.int32)
    sp = RNG.integers(0, 1000, (L, 3)).astype(np.int32)
    np.asarray(_run2(kernel, lo, sp, out_w=512))


def _s7_variant(mode):
    """b0-stage crash isolation: 'scratch' round-trips the udiv quotient
    through VMEM (fusion barrier); 'dead' computes udiv but uses a shift
    quotient (presence vs dataflow); 'opt' uses optimization_barrier."""

    def kernel(lo_ref, sp_ref, o_ref, scr):
        st = _ac_state()
        act = jnp.ones((L, 1), jnp.bool_)
        for k in range(3):
            low_f = lo_ref[:, k : k + 1] % 100
            span = sp_ref[:, k : k + 1] % 50 + 1
            total = low_f + span + 37
            total_s = jnp.maximum(total.astype(U32), 1)
            q, _ = prims.udiv_u32(st["high"] - st["low"] + 1, total_s)
            if mode == "scratch":
                scr[:, 0:1] = q.astype(I32)
                step = scr[:, 0:1].astype(U32)
            elif mode == "dead":
                scr[:, 0:1] = q.astype(I32)  # keep udiv alive
                step = (st["high"] - st["low"] + 1) >> 9
            else:
                step = jax.lax.optimization_barrier(q)
            high = st["low"] + prims.imul_u32(
                step, (low_f + span).astype(U32)) - 1
            low = st["low"] + prims.imul_u32(step, low_f.astype(U32))
            n, v, low2, high2, m = prims.ac_enc_renorm_counts(low, high)
            n = jnp.where(act, n, 0)
            emit = act & (n > 0)
            b0 = (v >> jnp.maximum(n - 1, 0).astype(U32)) & 1
            win, nbits = prims.sink_put_bits(
                st["win"], st["nbits"], st["win_base"], b0,
                jnp.where(emit, 1, 0), emit,
            )
            st = dict(
                st, low=low2, high=high2,
                scale=jnp.where(emit, m, st["scale"] + m),
                win=win, nbits=nbits,
            )
        o_ref[:, :] = st["win"]

    lo = RNG.integers(0, 1000, (L, 3)).astype(np.int32)
    sp = RNG.integers(0, 1000, (L, 3)).astype(np.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, 512), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((L, 128), jnp.int32)],
        interpret=INTERPRET,
    )(lo, sp)
    np.asarray(out)


if __name__ == "__main__":
    check("S1_bool_while_carry", s1_bool_while_carry)
    check("S1b_i32_while_carry", s1b_i32_while_carry)
    check("S2_bitrev32", s2_bitrev32)
    check("S3_mask_u32", s3_mask_u32)
    check("S4_sink_put_bits", s4_sink_put_bits)
    check("S5_renorm_counts", s5_renorm_counts)
    check("S6_ac_encode_full", s6_ac_encode_full)
    for st in ("interval", "renorm", "b0", "run", "tail", "noudiv"):
        check(f"S6_{st}", lambda st=st: _s6_variant(st))
    for md in ("scratch", "dead", "opt"):
        check(f"S7_{md}", lambda md=md: _s7_variant(md))


def _s8_variant(mode):
    """Minimal combos with one sink_put_bits: which op breaks it?
    'fdiv' f32 divide; 'sitofp' i32->f32; 'fptosi' f32->i32; 'floor';
    'log2'; 'f32u32' prims.f32_of_u32; 'divmix' fdiv+floor+fptosi."""

    def kernel(a_ref, b_ref, o_ref, scr):
        a = a_ref[:, 0:1]
        b = b_ref[:, 0:1] | 1
        if mode == "fdiv":
            x = (a.astype(jnp.float32) * 0 + 3.0) / (b.astype(jnp.float32) * 0 + 2.0)
            scr[:, 0:1] = (x * 2.0).astype(I32)
        elif mode == "sitofp":
            scr[:, 0:1] = (a.astype(jnp.float32) + 1.0).astype(I32) * 0 + 1
        elif mode == "fptosi":
            x = a.astype(jnp.float32) * 0.5
            scr[:, 0:1] = x.astype(I32)
        elif mode == "floor":
            x = jnp.floor(a.astype(jnp.float32) * 0.3)
            scr[:, 0:1] = x.astype(I32)
        elif mode == "log2":
            x = -jnp.log2(jnp.maximum(a.astype(jnp.float32), 1.0))
            scr[:, 0:1] = x.astype(I32)
        elif mode == "f32u32":
            x = prims.f32_of_u32(a.astype(U32))
            scr[:, 0:1] = x.astype(I32)
        elif mode == "divmix":
            af = prims.f32_of_u32(a.astype(U32))
            bf = prims.f32_of_u32(b.astype(U32))
            est = jnp.maximum(jnp.floor(af / bf * 0.999) - 1.0, 0.0)
            scr[:, 0:1] = est.astype(I32)
        win = jnp.zeros((L, 512), I32)
        nbits = jnp.zeros((L, 1), I32)
        base = jnp.zeros((L, 1), I32)
        act = jnp.ones((L, 1), jnp.bool_)
        win, nbits = prims.sink_put_bits(
            win, nbits, base, a.astype(U32), b & 31, act
        )
        o_ref[:, :] = win + scr[:, 0:1] * 0

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, 512), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((L, 128), jnp.int32)],
        interpret=INTERPRET,
    )(A, B)
    np.asarray(out)

if "__s8__":
    pass


def _s9_variant(mode):
    """'imul' imul_u32+sink; 'udiv' full udiv+sink (no renorm);
    'udiv_renorm' udiv+renorm (no sink, = S6_renorm sanity);
    'renorm_sink' renorm+sink (no udiv)."""

    def kernel(a_ref, b_ref, o_ref, scr):
        a = a_ref[:, 0:1]
        b = b_ref[:, 0:1] | 1
        win = jnp.zeros((L, 512), I32)
        nbits = jnp.zeros((L, 1), I32)
        base = jnp.zeros((L, 1), I32)
        act = jnp.ones((L, 1), jnp.bool_)
        do_sink = True
        if mode == "imul":
            scr[:, 0:1] = prims.imul_u32(a.astype(U32), b.astype(U32)).astype(I32)
        elif mode in ("udiv", "udiv_renorm"):
            q, r = prims.udiv_u32(a.astype(U32), b.astype(U32))
            scr[:, 0:1] = q.astype(I32) + r.astype(I32)
            if mode == "udiv_renorm":
                n, v, lo2, hi2, m = prims.ac_enc_renorm_counts(
                    q & jnp.uint32(0x3FFFFFFF),
                    (q | jnp.uint32(1)) & jnp.uint32(0x7FFFFFFF))
                scr[:, 1:2] = n + m + v.astype(I32) + lo2.astype(I32) + hi2.astype(I32)
                do_sink = False
        elif mode == "renorm_sink":
            n, v, lo2, hi2, m = prims.ac_enc_renorm_counts(
                a.astype(U32) & jnp.uint32(0x3FFFFFFF),
                (a.astype(U32) | 1) & jnp.uint32(0x7FFFFFFF))
            scr[:, 1:2] = n + m + lo2.astype(I32) + hi2.astype(I32)
            win, nbits = prims.sink_put_bits(win, nbits, base, v, n & 31, act)
            do_sink = False
        if do_sink:
            win, nbits = prims.sink_put_bits(
                win, nbits, base, a.astype(U32), b & 31, act
            )
        o_ref[:, :] = win + scr[:, 0:1] * 0 + nbits * 0

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, 512), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((L, 128), jnp.int32)],
        interpret=INTERPRET,
    )(A, B)
    np.asarray(out)


def _s11_variant(mode):
    """'uge_shift': u32 >= compare + variable u32 shift in one kernel.
    'xor_shift': same compare done in i32 via sign-bias xor.
    'uge_only': u32 compare alone.  'shift_only': variable shift alone."""

    def kernel(a_ref, b_ref, o_ref):
        au = a_ref[:, :].astype(U32)
        bu = b_ref[:, :].astype(U32)
        sh = bu & 31
        if mode == "uge_shift":
            ge = au >= bu
            x = au << sh
            o_ref[:, :] = jnp.where(ge, x, 0).astype(I32)
        elif mode == "xor_shift":
            bias = jnp.int32(-2147483648)
            ge = (au.astype(I32) ^ bias) >= (bu.astype(I32) ^ bias)
            x = au << sh
            o_ref[:, :] = jnp.where(ge, x, 0).astype(I32)
        elif mode == "uge_only":
            o_ref[:, :] = (au >= bu).astype(I32)
        else:
            o_ref[:, :] = (au << sh).astype(I32)

    out = np.asarray(_run2(kernel, A, B, out_w=128))
    au = A.astype(np.uint32)
    bu = B.astype(np.uint32)
    sh = bu & 31
    if mode in ("uge_shift", "xor_shift"):
        want = np.where(au >= bu, (au << sh).astype(np.uint32), 0).view(np.int32)
        np.testing.assert_array_equal(out, want, err_msg=mode)
