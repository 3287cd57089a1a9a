"""probe10: which decode primitive breaks at LANES=16? (round 4)

The L=16 encoder is hardware-exact; the decoder corrupts its FIRST
event (wrong literal length).  This probe runs each decoder primitive
in a minimal pallas kernel at the CURRENT LANES and diffs hardware
against interpret: cumsum_excl, model_decode (the length-symbol path),
model_decode_cum, src_get_bits, udiv_u32_fast, ac_decode_value/update.

Run: X3TPU_VM_LANES=16 python experiments/probe10_l16.py
"""

import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
sys.path.insert(0, "/root/repo")

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from x3tpu.vm import prims
from x3tpu.vm.config import LANES

I32 = jnp.int32
U32 = jnp.uint32
L = LANES
T0 = time.time()


def log(m):
    print(f"[p10 +{time.time()-T0:6.1f}s] {m}", flush=True)


def kern(ms_ref, val_ref, win_ref, o_cum, o_md, o_mdc, o_src, o_div,
         o_acd):
    ms = ms_ref[:, :]
    val = val_ref[:, 0:1].astype(U32)
    # (a) cumsum_excl over [L,128]
    o_cum[:, :] = prims.cumsum_excl(ms)
    # (b) model_decode (the decoder's length-symbol path)
    sym, low, span = prims.model_decode(ms, val, 128)
    o_md[:, :] = jnp.concatenate(
        [sym, low, span, jnp.zeros((L, 125), I32)], axis=1)
    # (c) model_decode_cum on an inclusive-cumsum row
    cum = prims.cumsum_excl(ms) + ms  # inclusive
    sym2, low2, span2 = prims.model_decode_cum(cum, val, 128)
    o_mdc[:, :] = jnp.concatenate(
        [sym2, low2, span2, jnp.zeros((L, 125), I32)], axis=1)
    # (d) src_get_bits from a [L,512] window
    win = win_ref[:, :]
    bitpos = val_ref[:, 1:2]
    v, bp2 = prims.src_get_bits(
        win, bitpos, jnp.zeros((L, 1), I32),
        jnp.full((L, 1), 512, I32), jnp.full((L, 1), 24, I32),
        jnp.ones((L, 1), jnp.bool_),
    )
    o_src[:, :] = jnp.concatenate(
        [v.astype(I32), bp2, jnp.zeros((L, 126), I32)], axis=1)
    # (e) udiv_u32_fast
    a = val_ref[:, 2:3].astype(U32)
    b = val_ref[:, 3:4].astype(U32)
    q, r = prims.udiv_u32_fast(a, b)
    o_div[:, :] = jnp.concatenate(
        [q.astype(I32), r.astype(I32), jnp.zeros((L, 126), I32)], axis=1)
    # (f) one ac_decode_value + ac_decode_update round
    st = dict(
        low=jnp.zeros((L, 1), U32),
        high=jnp.full((L, 1), 0x7FFFFFFF, U32),
        buf=val_ref[:, 4:5].astype(U32),
        bitpos=jnp.full((L, 1), 31, I32),
        src_base=jnp.zeros((L, 1), I32),
        nwords=jnp.full((L, 1), 512, I32),
        win=win,
    )
    tot = jnp.sum(ms, axis=1, keepdims=True)
    step, value = prims.ac_decode_value(st, tot)
    st2 = prims.ac_decode_update(
        st, step, low, span, jnp.ones((L, 1), jnp.bool_))
    o_acd[:, :] = jnp.concatenate(
        [step.astype(I32), value.astype(I32), st2["low"].astype(I32),
         st2["high"].astype(I32), st2["buf"].astype(I32), st2["bitpos"],
         jnp.zeros((L, 122), I32)], axis=1)


def run(interpret):
    rng = np.random.default_rng(9)
    ms = np.ones((L, 128), np.int32)
    ms[:, :32] += rng.integers(0, 5, (L, 32))
    vals = np.zeros((L, 8), np.int32)
    vals[:, 0] = rng.integers(0, ms[:, :32].sum(1))        # value < total
    vals[:, 1] = rng.integers(0, 400, L)                   # bitpos
    vals[:, 2] = rng.integers(0, 1 << 31, L)               # a
    vals[:, 3] = rng.integers(1, 1 << 20, L)               # b
    vals[:, 4] = rng.integers(0, 1 << 31, L)               # buf
    win = rng.integers(0, 1 << 31, (L, 512)).astype(np.int32)
    outs = [jax.ShapeDtypeStruct((L, 128), jnp.int32)] * 6
    f = pl.pallas_call(
        kern, out_shape=outs, interpret=interpret,
    )
    return [np.asarray(o) for o in
            f(jnp.asarray(ms), jnp.asarray(vals), jnp.asarray(win))]


def main():
    log(f"LANES={L}")
    hw = run(False)
    it = run(True)
    names = ["cumsum_excl", "model_decode", "model_decode_cum",
             "src_get_bits", "udiv_u32_fast", "ac_decode"]
    rc = 0
    for n, h, i in zip(names, hw, it):
        if np.array_equal(h, i):
            log(f"{n:18s} OK")
        else:
            d = np.argwhere(h != i)
            log(f"{n:18s} DIFFERS at {len(d)} cells; first {d[0].tolist()}"
                f" hw={h[tuple(d[0])]} it={i[tuple(d[0])]}")
            rc = 1
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
