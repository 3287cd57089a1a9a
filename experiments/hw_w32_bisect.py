"""Which kernel region crashes the compile helper at w32 + d8192?

The chunked scan fixed w32 at d=1024 (hw_w32_compile: compiles, runs,
exact) but the MATRIX config (128 KiB blocks -> d=8192, probe_gate ON)
still kills the helper (mx32 pass: HTTP 500 twice).  Local MLIR module
size does NOT predict the crash (w8/d24576 is 2x bigger and compiles),
so this bisects by REGION: AOT-compile the encoder at w32/d8192 under
each perf-ablate set and record ok/crash.  Ablates produce wrong
streams, which is fine — only compilability is being probed.

Run: python experiments/hw_w32_bisect.py [ablate,ablate ...]
Default sets: full noscan nosweep sweepfast noprobe nodma
"""

import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
sys.path.insert(0, "/root/repo")

import jax.numpy as jnp

from x3tpu.config import X3Params
from x3tpu.parallel.runtime import caps_for_block
from x3tpu.vm import driver as dv
from x3tpu.vm.kernel import build_encoder_call

T0 = time.time()


def log(m):
    print(f"[w32bis +{time.time()-T0:6.1f}s] {m}", flush=True)


def main():
    # argv sets may carry config tokens: d=<dict_cap> and w=<window>
    # (e.g. "d=4096+nogate", "w=16384") — the rest are kernel ablates
    sets = ([frozenset() if s == "full" else frozenset(s.split("+"))
             for s in sys.argv[1:]] or
            [frozenset(), frozenset({"noscan"}), frozenset({"nosweep"}),
             frozenset({"sweepfast"}), frozenset({"noprobe"}),
             frozenset({"nodma"}), frozenset({"nogate"})])
    params = X3Params(window=32 * 1024)
    caps = caps_for_block(128 << 10)
    from x3tpu.vm.config import set_active_lanes, vm_caps
    set_active_lanes(8)
    vc = vm_caps(params, caps)
    log(f"config: d={vc.dict_cap} scan_chunk={vc.scan_chunk} "
        f"probe_gate={vc.probe_gate} wbuf={vc.wbuf}")
    G, sb = 1, 1
    trows = vc.text_bytes // 128
    text = jnp.zeros((8 * trows, 128), jnp.int32)
    tlen = jnp.zeros((8,), jnp.int32)
    state = dv._init_state(text, tlen, vc, G)

    import dataclasses

    # CONTROL first: the w32/d1024 config compiled on hardware this
    # morning (hw_w32_compile).  If the control crashes too, the helper
    # is globally degraded (weather) and the ablate results below are
    # void for program-size conclusions.
    caps_ctl = caps_for_block(16 << 10)
    vc_ctl = vm_caps(params, caps_ctl)
    trows_c = vc_ctl.text_bytes // 128
    text_c = jnp.zeros((8 * trows_c, 128), jnp.int32)
    state_c = dv._init_state(text_c, jnp.zeros((8,), jnp.int32), vc_ctl, G)
    # nsteps 16381: dodge the persistent-cache hit from this
    # morning's successful compile (a cache hit skips the helper
    # and would prove nothing about its health)
    call_c = build_encoder_call(vc_ctl, params, 16381, G, SB=sb)
    t0 = time.time()
    try:
        jax.jit(lambda t, *s: call_c((t,), *s)).lower(
            text_c, *state_c).compile()
        log(f"{'control-d1024':12s} COMPILED in {time.time()-t0:6.1f}s "
            "(helper healthy)")
    except Exception as e:
        log(f"{'control-d1024':12s} CRASH after {time.time()-t0:6.1f}s — "
            f"HELPER DEGRADED, results below are weather: "
            f"{str(e)[:120]}")

    for ab in sets:
        tag = "+".join(sorted(ab)) or "full"
        pk, ck = params, caps
        for tok in [t for t in ab if t.startswith(("d=", "w="))]:
            k, v = tok.split("=")
            if k == "d":
                ck = dataclasses.replace(ck, dict_cap=int(v))
            else:
                pk = dataclasses.replace(pk, window=int(v))
        ab = frozenset(t for t in ab
                       if not t.startswith(("d=", "w=")))
        vck = vm_caps(pk, ck)
        if "nogate" in ab:  # config knob, not a kernel ablate: dense probe
            vck = dataclasses.replace(vck, probe_gate=False)
            ab = ab - {"nogate"}
        trows_k = vck.text_bytes // 128
        text_k = jnp.zeros((8 * trows_k, 128), jnp.int32)
        state_k = dv._init_state(text_k, jnp.zeros((8,), jnp.int32), vck, G)
        call = build_encoder_call(vck, pk, 16384, G, ablate=ab, SB=sb)
        f = jax.jit(lambda t, *s: call((t,), *s))
        t0 = time.time()
        try:
            lowered = f.lower(text_k, *state_k)
            compiled = lowered.compile()
            log(f"{tag:28s} COMPILED in {time.time()-t0:6.1f}s")
        except Exception as e:
            log(f"{tag:28s} CRASH after {time.time()-t0:6.1f}s: "
                f"{type(e).__name__}: {str(e)[:120]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
