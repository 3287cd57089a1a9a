"""Benchmark harness: lane-parallel encode throughput on real hardware.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference C binary encodes source text at ~0.12 MB/s on one
x86-64 core at default parameters (BASELINE.md §B, measured via the
binary's own codec-loop timer).  This harness times our codec's steady-
state encode on the same kind of workload (deterministic source-text
corpus, default -t 15 -w 8), lane-parallel on whatever device JAX provides
(TPU under the driver; CPU in dev runs), round-trip-verified.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

# Reference binary measured on THIS machine on the exact default bench
# input (build_corpus(512*1024), -t 15 -w 8, codec-loop time printed by the
# binary itself): 512 KiB / 10.31 s = 0.0508 MB/s.  (BASELINE.md's 0.12
# MB/s was 371 KB of denser source text; the reference slows down on larger
# inputs because every event rescans the grown dictionary.)
BASELINE_ENCODE_MBS = 0.0508


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

    # persistent compile cache: the driver's bench process then reuses
    # compilations from earlier runs on this machine
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from x3tpu import codec
    from x3tpu.config import X3Params
    from x3tpu.parallel.runtime import caps_for_block

    block = block_kib * 1024
    params = X3Params()  # reference defaults: -t 15 -w 8
    caps = caps_for_block(block)
    data = build_corpus(lanes * block)
    blocks = [data[i * block : (i + 1) * block] for i in range(lanes)]

    import jax.numpy as jnp

    text, tlen = codec.pack_blocks(blocks, params, caps)
    text_j, tlen_j = jnp.asarray(text), jnp.asarray(tlen)

    # compile + warm up (chunked execution: bounded device programs)
    out = codec.encode_blocks_chunked(text_j, tlen_j, params, caps)
    jax.block_until_ready(out[1])

    t0 = time.time()
    words, byte_lens, counts, sizes, overflow = codec.encode_blocks_chunked(
        text_j, tlen_j, params, caps
    )
    jax.block_until_ready(byte_lens)
    dt = time.time() - t0

    assert not bool(np.asarray(overflow.any_flag()).any()), "capacity overflow"

    # verify round-trip on the device decoder
    out_arr, out_lens, _, _, d_of = codec.decode_blocks_chunked(
        words, byte_lens, params, caps
    )
    out_np = np.asarray(out_arr)
    lens_np = np.asarray(out_lens)
    for i, b in enumerate(blocks):
        assert out_np[i, : lens_np[i]].tobytes() == b, f"round-trip fail {i}"

    mbs = len(data) / dt / 1e6
    print(json.dumps({
        "metric": "encode_throughput_default_params",
        "value": round(mbs, 4),
        "unit": "MB/s",
        "vs_baseline": round(mbs / BASELINE_ENCODE_MBS, 2),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
