"""Hardware smoke of the VM huge-row tier (one real TPU chip).

Stage 1: the engineered ~900-byte corpus from tests/test_vm.py (lowered
big->huge trigger, nr2=8, D=384) — compiles fast, exercises every huge
code path (promotion in both families, find/stats/decode_pos/update,
fetch/write-back DMAs, prev-swap) and checks bit-exactness vs the spec
oracle plus a VM decode round trip, all on Mosaic rather than interpret.

Stage 2 (--big): a 256 KiB slice of the config-#3 binary corpus at the
full 4 MB-regime capacities (D=24576 non-pow2, nr2_1=64, s0=512K) —
validates the giant-capacity compile and the real span sizes without
paying the full 4 MiB runtime.

Usage: python experiments/hw_vm_huge.py [--big]
"""

import dataclasses
import pathlib
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
sys.path.insert(0, "/root/repo")

import jax.numpy as jnp  # noqa: E402

from x3tpu import codec, spec  # noqa: E402
from x3tpu.config import CodecCaps, X3Params  # noqa: E402
from x3tpu.vm import driver as vmdrv  # noqa: E402
from x3tpu.vm.config import R_HUGE0_N, R_HUGE1_N, vm_caps  # noqa: E402

T0 = time.time()


def log(msg):
    print(f"[hw_huge +{time.time()-T0:6.1f}s] {msg}", flush=True)


def stage1():
    params = X3Params(max_match_count=15, window=32)
    caps = CodecCaps(dict_cap=384, pair_cap=2048, ctx_items_cap=1024,
                     ctx0_items_cap=1024, ctx_small_cap=16, block_bytes=1024)
    pre = bytes(range(1, 251))
    X, Y = 251, 252
    body = b"".join(bytes([X, Y, c]) for c in range(1, 231))
    data = pre + body
    vc = dataclasses.replace(vm_caps(params, caps),
                             big_trig0=200, big_trig1=160)
    text, tlen = codec.pack_blocks([data], params, caps)
    text_flat = vmdrv._prep_text(jnp.asarray(text, jnp.uint8), vc, 1,
                                 text.shape[1])
    tlen_p = jnp.pad(jnp.asarray(tlen, jnp.int32), (0, 7))
    state = vmdrv._init_state(text_flat, tlen_p, vc, 1)
    step = vmdrv._get_step(vc, params, 4096, 1, False)
    log("stage1: compiling + running encoder (hardware)")
    while bool(vmdrv._any_active(state[13])):
        state = step(text_flat, *state)
    regs = np.asarray(state[13])
    assert regs[0, R_HUGE1_N] > 0 and regs[0, R_HUGE0_N] > 0, (
        regs[0, R_HUGE0_N], regs[0, R_HUGE1_N])
    words, byte_lens, _, _, of = vmdrv._finalize(state, vc)
    words, byte_lens = np.asarray(words), np.asarray(byte_lens)
    assert not any(np.asarray(getattr(of, f))[0] for f in of._fields)
    got = words[0].astype("<u4").tobytes()[: byte_lens[0]]
    want = spec.encode(data, params)
    assert got == want, "stage1 encode mismatch vs spec"
    log(f"stage1: encode BIT-EXACT ({len(got)} bytes), "
        f"huge0={regs[0, R_HUGE0_N]} huge1={regs[0, R_HUGE1_N]}")

    out, opos, _, _, dof = vmdrv.decode_blocks_vm_chunked(
        words[:1], byte_lens[:1], params, caps, vc=vc, interpret=False
    )
    assert not any(np.asarray(getattr(dof, f))[0] for f in dof._fields)
    assert np.asarray(out)[0, : np.asarray(opos)[0]].tobytes() == data
    log("stage1: decode round trip EXACT")


def stage2():
    sp = pathlib.Path("/opt/venv/lib/python3.12/site-packages")
    sos = sorted(sp.rglob("*.so"), key=lambda p: -p.stat().st_size)
    blob = b"".join(p.read_bytes() for p in sos[:16])[: 256 << 10]
    params = X3Params()
    caps = CodecCaps(dict_cap=24576, pair_cap=1 << 19, ctx_items_cap=8192,
                     ctx0_items_cap=2048, ctx_small_cap=16,
                     block_bytes=4 << 20)
    vc = vm_caps(params, caps)
    log(f"stage2: D={vc.dict_cap} nr2={vc.nr2_0}/{vc.nr2_1} "
        f"pb2={vc.pb2_0}/{vc.pb2_1} s0={vc.s0}")
    text, tlen = codec.pack_blocks([blob], params, caps)
    t0 = time.time()
    words, byte_lens, counts, sizes, of = vmdrv.encode_blocks_vm_chunked(
        text, tlen, params, caps, chunk_steps=16384
    )
    words, byte_lens = np.asarray(words), np.asarray(byte_lens)
    te = time.time() - t0
    assert not any(np.asarray(getattr(of, f))[0] for f in of._fields), of
    got = words[0].astype("<u4").tobytes()[: byte_lens[0]]
    mb = len(blob) / 1e6
    log(f"stage2: encoded {len(blob)} -> {len(got)} bytes in {te:.1f}s "
        f"({mb/te:.4f} MB/s incl. compile)")
    t0 = time.time()
    out, opos, _, _, dof = vmdrv.decode_blocks_vm_chunked(
        words[:1], byte_lens[:1], params, caps, chunk_steps=16384
    )
    td = time.time() - t0
    assert not any(np.asarray(getattr(dof, f))[0] for f in dof._fields)
    assert np.asarray(out)[0, : np.asarray(opos)[0]].tobytes() == blob
    log(f"stage2: decode round trip EXACT in {td:.1f}s "
        f"({mb/td:.4f} MB/s incl. compile)")


def main():
    log(f"devices: {jax.devices()}")
    stage1()
    if "--big" in sys.argv:
        stage2()
    log("ALL OK")


if __name__ == "__main__":
    main()
