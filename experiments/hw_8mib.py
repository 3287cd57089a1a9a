"""8 MiB text block on the VM, hardware validation (round-5 queue #5).

caps_for_block now lands 8-16 MiB blocks on VM-hostable capacities
(items 4096/4096, pairs 1M cap; host.measure_state 2026-08-20).  This
probe encodes ONE 8 MiB text block on the VM, checks the stream is
byte-identical to the host codec's (the strong lockstep check), and
decodes it back on the VM.

Run: python experiments/hw_8mib.py [mib]
"""

import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

import jax.numpy as jnp

from x3tpu import codec, host
from x3tpu.config import X3Params
from x3tpu.parallel.runtime import caps_for_block
from x3tpu.vm import decode_blocks_vm_chunked, encode_blocks_vm_chunked

T0 = time.time()


def log(m):
    print(f"[8mib +{time.time()-T0:6.1f}s] {m}", flush=True)


def main():
    mib = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from bench import build_corpus

    bb = mib << 20
    params = X3Params()
    caps = caps_for_block(bb)
    log(f"caps: dict={caps.dict_cap} pairs={caps.pair_cap} "
        f"items={caps.ctx_items_cap}/{caps.ctx0_items_cap}")
    data = build_corpus(bb)
    log("host-encoding the reference stream (lockstep target)")
    want = host.encode(data, params)
    log(f"host stream: {len(want)} bytes (ratio {bb/len(want):.4f})")

    text, tlen = codec.pack_blocks([data], params, caps)
    t0 = time.time()
    words, byte_lens, counts, sizes, of = encode_blocks_vm_chunked(
        jnp.asarray(text), jnp.asarray(tlen), params, caps,
        chunk_steps=16384)
    bl = np.asarray(byte_lens)
    t_enc = time.time() - t0
    for f in of._fields:
        assert not np.asarray(getattr(of, f))[0], f"overflow {f}"
    got = np.asarray(words)[0].astype("<u4").tobytes()[: bl[0]]
    log(f"VM encode: {t_enc:.1f}s (incl. compile) = "
        f"{bb/t_enc/1e6:.4f} MB/s; stream "
        + ("BYTE-IDENTICAL to host" if got == want else "MISMATCH!"))
    if got != want:
        return 1

    # timed steady-state encode (state cached, compile done)
    t0 = time.time()
    _, bl2, *_ = encode_blocks_vm_chunked(
        jnp.asarray(text), jnp.asarray(tlen), params, caps,
        chunk_steps=16384)
    _ = np.asarray(bl2)
    t_enc2 = time.time() - t0
    log(f"steady-state encode: {t_enc2:.1f}s = {bb/t_enc2/1e6:.4f} MB/s")

    iw = (int(bl[0]) + 3) // 4 + 2
    w_in = np.asarray(words)[:, :iw].astype(np.uint32)
    t0 = time.time()
    out, opos, *_ = decode_blocks_vm_chunked(
        w_in, bl, params, caps, chunk_steps=16384)
    opos_np = np.asarray(opos)
    t_dec = time.time() - t0
    ok = np.asarray(out)[0, : opos_np[0]].tobytes() == data
    log(f"VM decode: {t_dec:.1f}s (incl. compile) = "
        f"{bb/t_dec/1e6:.4f} MB/s; " + ("round trip EXACT" if ok
                                        else "MISMATCH!"))
    if not ok:
        return 1
    t0 = time.time()
    out, opos, *_ = decode_blocks_vm_chunked(
        w_in, bl, params, caps, chunk_steps=16384)
    _ = np.asarray(opos)
    t_dec2 = time.time() - t0
    log(f"steady-state decode: {t_dec2:.1f}s = {bb/t_dec2/1e6:.4f} MB/s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
