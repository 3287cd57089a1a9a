"""Benchmark harness: lane-parallel encode throughput on real hardware.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference C binary measured on THIS machine on the exact
default bench input (build_corpus(512*1024), -t 15 -w 8, codec-loop time
printed by the binary itself): 0.0508 MB/s (BENCH_NOTES.md "Matched-corpus
baseline").  This harness times our codec's steady-state encode on the same
bytes and parameters, lane-parallel on whatever device JAX provides (TPU
under the driver; CPU in dev runs).

Cold-process budget (round-1 verdict item #2): the only slow step allowed
before the JSON line is the encoder compile (persistent-cached under
/tmp/jaxcache).  Round-trip verification therefore runs through the native
C++ host decoder (bit-exactness proven in tests/), not the XLA decoder —
that halves the compile count and replaces a ~5 s device decode with a
~2 s host decode.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

BASELINE_ENCODE_MBS = 0.0508
BASELINE_DECODE_MBS = 0.0915  # reference binary, same corpus (BENCH_NOTES)


def log(msg: str) -> None:
    print(f"[bench +{time.time() - T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


T0 = time.time()


def build_corpus(total: int) -> bytes:
    """Deterministic diverse source-text corpus: the reference C sources
    followed by the jax package sources (tens of MB of distinct text, so
    multi-MB corpora don't degenerate into repeats of one blob)."""
    parts = []
    src = Path("/root/reference")
    if src.exists():
        for f in sorted(src.glob("*.c")) + sorted(src.glob("*.md")):
            parts.append(f.read_bytes())
    jax_src = Path("/opt/venv/lib/python3.12/site-packages/jax")
    if jax_src.exists():
        budget = total + (1 << 20)
        acc = sum(len(p) for p in parts)
        for f in sorted(jax_src.rglob("*.py")):
            if acc >= budget:
                break
            try:
                b = f.read_bytes()
            except OSError:
                continue
            parts.append(b)
            acc += len(b)
    if not parts:  # fallback: synthetic text
        parts = [(b"int main(void) { return compress(buf, %d); }\n" % i)
                 for i in range(1000)]
    blob = b"".join(parts)
    reps = total // len(blob) + 1
    return (blob * reps)[:total]


def main() -> int:
    lanes = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    block_kib = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import jax

    # persistent compile cache: reruns (including the driver's bench
    # process) reuse compilations from earlier runs on this machine
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # the container's sitecustomize pins the axon platform via
    # jax.config, which overrides JAX_PLATFORMS; honor an explicit
    # CPU request for dev runs the same way conftest.py does
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    # Fail FAST if the device never comes up.  A dead axon relay makes
    # jax.devices() retry /init forever with no error (CLAUDE.md,
    # diagnosed 2026-08-18) — round 1's bench artifact was rc=124 because
    # the process hung to the driver's timeout.  A clear early exit beats
    # a silent hang.
    import threading

    ready: list = []
    probe = threading.Thread(
        target=lambda: ready.append(jax.devices()), daemon=True
    )
    probe.start()
    probe.join(timeout=240)
    if not ready:
        log("FATAL: jax.devices() did not return within 240s — device "
            "backend unreachable (axon relay down?).  See CLAUDE.md "
            "'TPU environment gotchas' for the recovery recipe.")
        return 3

    from x3tpu import codec
    from x3tpu.config import X3Params
    from x3tpu.parallel.runtime import caps_for_block

    block = block_kib * 1024
    params = X3Params()  # reference defaults: -t 15 -w 8
    caps = caps_for_block(block)
    data = build_corpus(lanes * block)
    blocks = [data[i * block : (i + 1) * block] for i in range(lanes)]
    log(f"corpus ready: {lanes} lanes x {block_kib} KiB on "
        f"{jax.default_backend()}")

    import dataclasses

    import jax.numpy as jnp

    # engine select maps onto CodecCaps.engine so the bench runs EXACTLY
    # the production single-device dispatch (runtime._encode_one_device:
    # VM kernel when the resolved engine selects it and the config fits,
    # XLA chunked driver otherwise; chunk_steps pinned there to 16384 so
    # the driver's cold bench run shares the persistent compile cache).
    # X3TPU_BENCH_VM: auto (VM on TPU) | 1 (force) | interpret | 0 (off)
    from x3tpu.parallel.runtime import _encode_one_device

    def _active_lanes(engine_used: str):
        # the VM lane width the direction just ran at (per-direction
        # widths since round 4: L=16 encoder, L=8 decoder on TPU).
        # Only meaningful when the row actually ran on the VM — a
        # demoted (xla) row would otherwise report whatever width the
        # previous VM call left active (round-4 advisor finding).
        if engine_used not in ("vm", "vm_interpret"):
            return None
        from x3tpu.vm import config as vmc
        return vmc.LANES

    vm_mode = os.environ.get("X3TPU_BENCH_VM", "auto")
    engine = {"auto": "auto", "1": "vm", "interpret": "vm_interpret",
              "0": "xla"}.get(vm_mode, "auto")
    caps = dataclasses.replace(caps, engine=engine)
    log(f"engine: {caps.resolved().engine} (production dispatch)")

    # kernel provenance for the artifact (round-3 verdict #4): the engine
    # actually used (demotions must be visible) + the kernel commit
    import subprocess

    try:
        commit = subprocess.run(
            ["git", "-C", str(Path(__file__).parent), "rev-parse",
             "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or "unknown"
    except Exception:
        commit = "unknown"

    text, tlen = codec.pack_blocks(blocks, params, caps)
    text_j, tlen_j = jnp.asarray(text), jnp.asarray(tlen)

    # compile + warm up (chunked execution: bounded device programs).
    # Warmup synchronizes via a VALUE READ: block_until_ready does not
    # wait through the axon tunnel (probe9 rule), and an unfinished
    # warmup would leak into the timed section.
    eng_used: list = []
    out = _encode_one_device(text_j, tlen_j, params, caps, None, eng_used)
    _ = np.asarray(out[1])
    log(f"compile + warmup done (engine: {eng_used[0]})")

    # N=3 timed runs, median reported (round-4 verdict weak #4: the
    # 32-lane default rows are dispatch-bound with ±6% day variance, so
    # a single run can't resolve the +2-3% kernel effects; the medians
    # plus the @128 rows below are the regression instruments)
    enc_times = []
    for _ in range(3):
        t0 = time.time()
        words, byte_lens, counts, sizes, overflow = _encode_one_device(
            text_j, tlen_j, params, caps, None
        )
        _ = np.asarray(byte_lens)  # value-read sync (probe9 rule)
        enc_times.append(time.time() - t0)
    dt = sorted(enc_times)[1]
    log(f"timed encode: {dt:.2f}s (3 runs: "
        f"{', '.join(f'{t:.2f}' for t in enc_times)})")

    codec._check_overflow(overflow)  # names the lane and capacity if hit

    # verify round-trip through the native host decoder (bit-exactness of
    # host vs spec vs JAX is covered by tests/; this catches stream damage)
    from x3tpu import host

    words_np = np.asarray(words)
    lens_np = np.asarray(byte_lens)
    for i, b in enumerate(blocks):
        stream = words_np[i].astype("<u4").tobytes()[: lens_np[i]]
        got = host.decode(stream, max_output=len(b) + 64)
        assert got == b, f"round-trip fail lane {i}"
    log("round-trip verified (host decoder)")

    mbs = len(data) / dt / 1e6
    print(json.dumps({
        "metric": "encode_throughput_default_params",
        "value": round(mbs, 4),
        "unit": "MB/s",
        "vs_baseline": round(mbs / BASELINE_ENCODE_MBS, 2),
        "engine": eng_used[0], "commit": commit,
        "lanes": _active_lanes(eng_used[0]),
        "runs_s": [round(t, 3) for t in enc_times],
    }), flush=True)

    # decode direction (round-2 verdict #5): time the production decode
    # dispatch on the just-encoded streams, synchronized by a value read
    # (probe9 rule: block_until_ready does not wait through the tunnel —
    # np.asarray below is the readback)
    from x3tpu.parallel.runtime import _decode_one_device

    iw = (int(lens_np.max()) + 3) // 4 + 2
    words_in = jnp.asarray(words_np[:, :iw].astype(np.uint32))
    lens_in = jnp.asarray(lens_np)
    deng_used: list = []
    out, opos, *_ = _decode_one_device(words_in, lens_in, params, caps,
                                       None, deng_used)
    _ = np.asarray(opos)
    log(f"decode compile + warmup done (engine: {deng_used[0]})")
    dec_times = []
    for _ in range(3):  # N=3, median (see the encode rows)
        t0 = time.time()
        out, opos, *_ = _decode_one_device(words_in, lens_in, params, caps,
                                           None)
        opos_np = np.asarray(opos)
        dec_times.append(time.time() - t0)
    ddt = sorted(dec_times)[1]
    out_np = np.asarray(out)
    for i, b in enumerate(blocks):
        assert out_np[i, : opos_np[i]].tobytes() == b, f"decode fail lane {i}"
    dmbs = len(data) / ddt / 1e6
    log(f"timed decode: {ddt:.2f}s (3 runs: "
        f"{', '.join(f'{t:.2f}' for t in dec_times)})")
    print(json.dumps({
        "metric": "decode_throughput_default_params",
        "value": round(dmbs, 4),
        "unit": "MB/s",
        "vs_baseline": round(dmbs / BASELINE_DECODE_MBS, 2),
        "engine": deng_used[0], "commit": commit,
        "lanes": _active_lanes(deng_used[0]),
        "runs_s": [round(t, 3) for t in dec_times],
    }), flush=True)

    # lane-scaling rows (round-2 verdict #6): each row is a separate
    # compile.  X3TPU_BENCH_SCALING="64,128" encodes AND decodes the same
    # corpus replicated to N lanes and prints JSON lines per N — the
    # regression guard for the kernel's lane scaling.  On TPU one
    # 128-lane row is emitted by default so the official artifact
    # documents the law (per-chip MB/s is flat in lanes: grid steps are
    # sequential; aggregate throughput scales by chips x hosts); CPU dev
    # runs stay opt-in, and "" / "0" disables.  Budget guard: these rows
    # are EXTRA compiles (a cold remote compile is 2-12 min); when the
    # persistent cache missed and the run is already past the deadline,
    # skip them rather than risk the driver's bench timeout — the main
    # encode/decode rows above are the official metrics.
    on_tpu = jax.default_backend() in ("tpu", "axon")
    scaling = os.environ.get("X3TPU_BENCH_SCALING", "128" if on_tpu else "")
    deadline = float(os.environ.get("X3TPU_BENCH_SCALING_DEADLINE", "900"))
    lanes_list = [int(x) for x in scaling.split(",")
                  if x.strip() and int(x) > 0]
    if lanes_list and time.time() - T0 > deadline:
        log(f"skipping scaling rows: +{time.time() - T0:.0f}s already "
            f"spent (cold compiles?), deadline {deadline:.0f}s")
        lanes_list = []
    for n in lanes_list:
        data_n = build_corpus(n * block)
        blocks_n = [data_n[i * block : (i + 1) * block] for i in range(n)]
        text_n, tlen_n = codec.pack_blocks(blocks_n, params, caps)
        text_j, tlen_j = jnp.asarray(text_n), jnp.asarray(tlen_n)
        o = _encode_one_device(text_j, tlen_j, params, caps, None)
        _ = np.asarray(o[1])  # warmup sync by VALUE READ (probe9 rule)
        t0 = time.time()
        w_n, bl, *_ = _encode_one_device(text_j, tlen_j, params, caps, None)
        bl_np = np.asarray(bl)
        sdt = time.time() - t0
        smbs = len(data_n) / sdt / 1e6
        print(json.dumps({
            "metric": f"encode_throughput_lanes_{n}",
            "value": round(smbs, 4),
            "unit": "MB/s",
            "vs_baseline": round(smbs / BASELINE_ENCODE_MBS, 2),
            "engine": eng_used[0], "commit": commit,
            "lanes": _active_lanes(eng_used[0]),
        }), flush=True)
        # decode direction of the same row (round-3 verdict #5: the
        # scaling story was encode-only)
        w_np = np.asarray(w_n)
        iw_n = (int(bl_np.max()) + 3) // 4 + 2
        words_n = jnp.asarray(w_np[:, :iw_n].astype(np.uint32))
        lens_n = jnp.asarray(bl_np)
        od = _decode_one_device(words_n, lens_n, params, caps, None)
        _ = np.asarray(od[1])
        t0 = time.time()
        _, opos_n, *_ = _decode_one_device(words_n, lens_n, params, caps,
                                           None)
        _ = np.asarray(opos_n)
        sddt = time.time() - t0
        sdmbs = len(data_n) / sddt / 1e6
        print(json.dumps({
            "metric": f"decode_throughput_lanes_{n}",
            "value": round(sdmbs, 4),
            "unit": "MB/s",
            "vs_baseline": round(sdmbs / BASELINE_DECODE_MBS, 2),
            "engine": deng_used[0], "commit": commit,
            "lanes": _active_lanes(deng_used[0]),
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
