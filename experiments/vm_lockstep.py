"""Lockstep state diff: codec-VM (interpret) vs the XLA encoder, one event
per step, single block.  Pinpoints the first diverging event and field."""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from x3tpu import codec
from x3tpu.config import CodecCaps, X3Params
from x3tpu.vm import config as vmc
from x3tpu.vm.driver import (
    _get_step, _init_state, _prep_text,
)
from x3tpu.vm.config import (
    LANES, R_AC_HIGH, R_AC_LOW, R_AC_SCALE, R_C1, R_DICT_N, R_NBITS,
    R_P, R_PAIR_N, R_PREV_C1, vm_caps,
)

import pathlib

params = X3Params(max_match_count=4, window=256)
caps = CodecCaps(
    dict_cap=128, pair_cap=512, ctx_items_cap=128, ctx0_items_cap=128,
    ctx_small_cap=16, block_bytes=2048,
)

which = int(sys.argv[1]) if len(sys.argv) > 1 else 0
golden = pathlib.Path("tests/golden/text_small.bin").read_bytes()
blocks_all = [
    b"abracadabra " * 40,
    golden[:1200],
    bytes(range(256)) * 3,
    np.random.default_rng(0).integers(0, 256, 700, np.uint8).tobytes(),
]
block = blocks_all[which]
print(f"block {which}: {len(block)} bytes")

# --- XLA side: single lane, event by event
text, tlen = codec.pack_blocks([block], params, caps)
carry = codec.enc_init_carry(
    jnp.asarray(text), jnp.asarray(tlen), params, caps
)
enc_body = jax.jit(
    lambda c: codec._enc_body(c, params, "xla")
)

# --- VM side: one event per launch
vc = vm_caps(params, caps)
text_flat = _prep_text(jnp.asarray(text, jnp.uint8), vc, 1, text.shape[1])
tlen_p = jnp.pad(jnp.asarray(tlen, jnp.int32), (0, LANES - 1))
state = _init_state(text_flat, tlen_p, vc, 1)
step = _get_step(vc, params, 1, 1, True)


def xla_obs(c):
    return dict(
        p=int(c.p[0]), prev=int(c.prev_c1[0]), c1=int(c.c1[0]),
        pairs=int(c.pair_n[0]), dn=int(c.d.n[0]),
        low=int(np.asarray(c.enc.low)[0]), high=int(np.asarray(c.enc.high)[0]),
        scale=int(c.enc.scale[0]), nbits=int(c.sink.nbits[0]),
    )


def vm_obs(st):
    r = np.asarray(st[13])[0]
    return dict(
        p=int(r[R_P]), prev=int(r[R_PREV_C1]), c1=int(r[R_C1]),
        pairs=int(r[R_PAIR_N]), dn=int(r[R_DICT_N]),
        low=int(np.uint32(r[R_AC_LOW])), high=int(np.uint32(r[R_AC_HIGH])),
        scale=int(r[R_AC_SCALE]), nbits=int(r[R_NBITS]),
    )


ev = 0
while True:
    a = xla_obs(carry)
    b = vm_obs(state)
    if a != b:
        print(f"DIVERGED after event {ev}:")
        for k in a:
            mark = "  <<<" if a[k] != b[k] else ""
            print(f"  {k}: xla={a[k]} vm={b[k]}{mark}")
        sys.exit(1)
    if a["p"] >= len(block):
        print(f"all {ev} events match; final state identical")
        sys.exit(0)
    carry = enc_body(carry)
    state = step(text_flat, *state)
    ev += 1
    if ev > 5000:
        print("too many events?")
        sys.exit(2)
