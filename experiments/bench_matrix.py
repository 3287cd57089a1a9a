"""BASELINE.json config-matrix benchmark vs the reference binary.

Silesia is not fetchable from this container (zero egress), so each config
runs on a DOCUMENTED PROXY corpus assembled from real container files in
the same class (see build_corpora).  For every config the same exact bytes
go through (a) our codec on the current JAX backend and (b) the reference
C binary (built from /root/reference sources copied to /tmp), recording
ratio + MB/s for both and a bit-exact cross-decode check: the C binary
must decode our stream byte-for-byte.

Usage: python experiments/bench_matrix.py [--cpu] [config ...]
Configs: text xml tabular binary sweep  (default: all but sweep)
"""

import json
import pathlib
import shutil
import subprocess
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")

T0 = time.time()
SP = pathlib.Path("/opt/venv/lib/python3.12/site-packages")


def log(msg):
    print(f"[matrix +{time.time()-T0:6.1f}s] {msg}", flush=True)


def _concat_files(paths, total):
    out = []
    acc = 0
    for p in paths:
        try:
            b = p.read_bytes()
        except OSError:
            continue
        out.append(b)
        acc += len(b)
        if acc >= total:
            break
    blob = b"".join(out)
    if len(blob) < total:  # repeat deterministically if scarce
        blob = (blob * (total // max(len(blob), 1) + 1))
    return blob[:total]


def build_corpora():
    """Proxy corpora per Silesia file class, from real container files."""
    corp = {}
    # dickens/webster-class: English prose -> concatenated package docs
    docs = sorted(SP.rglob("*.md")) + sorted(SP.rglob("*.rst"))
    corp["text"] = _concat_files(docs, 1 << 20)
    # xml-class: real XML files (dm_control schema et al.)
    xmls = sorted(SP.rglob("*.xml"))
    corp["xml"] = _concat_files(xmls, 512 << 10)
    # nci-class (highly redundant database): Unicode collation table
    allkeys = pathlib.Path("/usr/share/perl/5.36.0/Unicode/Collate/allkeys.txt")
    if allkeys.exists():
        corp["tabular"] = _concat_files([allkeys], 1 << 20)
    # mozilla/samba-class: executable binary
    sos = sorted(SP.rglob("*.so"), key=lambda p: -p.stat().st_size)
    corp["binary"] = _concat_files(sos[:1], 1 << 20)
    # mozilla/samba-class at 4 MB blocks (BASELINE config #3): 8 blocks of
    # real shared-object bytes; the reference side runs on the FIRST block
    # only (0.0186 MB/s measured -> 32 MB would take ~30 min)
    corp["binary4"] = _concat_files(sos[:16], 32 << 20)[: 4 << 20]
    corp["text128"] = corp["text"][: 128 << 10]
    # BASELINE config #4 proxy (full-corpus sweep): every class
    # concatenated, block-data-parallel across lanes on one chip (the
    # container has one real chip; 8-chip scaling is validated separately
    # by the dryrun_multichip CPU mesh + the 2-process multihost test)
    corp["sweep"] = (corp["text"] + corp["xml"] + corp.get("tabular", b"")
                     + corp["binary"])
    return corp


def build_reference():
    ref = pathlib.Path("/tmp/x3ref")
    binp = ref / "x3"
    if binp.exists():
        return binp
    ref.mkdir(exist_ok=True)
    for f in pathlib.Path("/root/reference").glob("*"):
        if f.is_file():
            shutil.copy(f, ref / f.name)
    subprocess.run(["make", "BUILD=release", "-C", str(ref)], check=True,
                   capture_output=True)
    return binp


def run_reference(binp, data, args):
    """(ratio, encode_MB/s, decode_MB/s, stream) from the C binary."""
    src = pathlib.Path("/tmp/x3ref/in.bin")
    src.write_bytes(data)
    for p in ("/tmp/x3ref/in.bin.x3", "/tmp/x3ref/out.bin"):
        pathlib.Path(p).unlink(missing_ok=True)
    t0 = time.time()
    r = subprocess.run(
        [str(binp), "-z", "-f"] + args + [str(src)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr[-500:]
    te = time.time() - t0
    stream = pathlib.Path("/tmp/x3ref/in.bin.x3").read_bytes()
    t0 = time.time()
    r = subprocess.run(
        [str(binp), "-d", "-f", "/tmp/x3ref/in.bin.x3"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr[-500:]
    td = time.time() - t0
    got = src.read_bytes()
    assert got == data, "reference round-trip failed"
    mb = len(data) / 1e6
    return len(data) / len(stream), mb / te, mb / td, stream


def run_ours(data, params, block_bytes, caps=None):
    """(ratio, encode MB/s, decode MB/s, payloads) block-DP on the current
    backend via the runtime (VM kernel on TPU, XLA on CPU)."""
    from x3tpu import codec
    from x3tpu.parallel import runtime

    if caps is None:
        caps = runtime.caps_for_block(block_bytes, window=params.window)
    blocks = [data[i : i + block_bytes]
              for i in range(0, len(data), block_bytes)]
    # warmup/compile on first block set
    eng: list = []
    t0 = time.time()
    res = runtime.encode_wave(blocks, params, caps, engine_out=eng)
    tc = time.time() - t0
    t0 = time.time()
    res = runtime.encode_wave(blocks, params, caps, engine_out=eng)
    te = time.time() - t0
    t0 = time.time()
    dec = runtime.decode_wave(res.payloads, [len(b) for b in blocks],
                              params, caps, engine_out=eng)
    td0 = time.time() - t0
    t0 = time.time()
    dec = runtime.decode_wave(res.payloads, [len(b) for b in blocks],
                              params, caps, engine_out=eng)
    td = time.time() - t0
    assert b"".join(dec.payloads) == data, "our round-trip failed"
    comp = sum(len(p) for p in res.payloads)
    mb = len(data) / 1e6
    # engines per phase: [enc warm, enc timed, dec warm, dec timed]
    return (len(data) / comp, mb / te, mb / td, res.payloads, tc,
            ",".join(eng))


def cross_decode(binp, payloads, blocks):
    """C binary decodes our per-block streams bit-exactly."""
    for i, (p, b) in enumerate(zip(payloads, blocks)):
        f = pathlib.Path("/tmp/x3ref/x.x3")
        f.write_bytes(p)
        r = subprocess.run([str(binp), "-d", "-f", str(f)],
                           capture_output=True)
        assert r.returncode == 0, f"block {i}: C decode rc {r.returncode}"
        got = pathlib.Path("/tmp/x3ref/x").read_bytes()
        assert got == b, f"block {i}: C cross-decode mismatch"
    return True


def main():
    from x3tpu.config import X3Params

    want = [a for a in sys.argv[1:] if not a.startswith("--")]
    corp = build_corpora()
    binp = build_reference()
    log(f"corpora: { {k: len(v) for k, v in corp.items()} }")

    import dataclasses

    from x3tpu.config import CodecCaps

    # BASELINE config #3 (mozilla/samba-class, independent 4 MB blocks).
    # Genuine diverse binary at 4 MB grows state to dict 21770 entries,
    # 391K pairs, ctx1 rows up to 7449 items (instrumented reference,
    # /tmp/ref4mb_hub.log 2026-08-18: hub rows only 1595/477; 61 non-hub
    # rows >640).  The VM kernel hosts this via the huge-row tier
    # (nr2_1=64 spans) and a 24576-entry dictionary (the largest that
    # fits the VMEM budget; 128-multiple, non-pow2 is fine).
    from x3tpu.parallel import runtime as rt

    # caps_for_block sizes the MB-block regime for the VM directly now
    caps_4mb = rt.caps_for_block(4 << 20)
    assert (caps_4mb.dict_cap, caps_4mb.ctx_items_cap) == (24576, 8192)

    # (name, corpus, reference args, params, block_bytes, caps)
    CONFIGS = [
        ("text", "text", ["-t", "15", "-w", "8"], X3Params(), 128 << 10,
         None),
        # single-block config: both codecs code the SAME one block, so the
        # ratio must be IDENTICAL (streams are bit-identical at equal
        # parameters) — the ratio gaps in multi-block rows are purely the
        # block-splitting tradeoff, not format loss
        ("text-1blk", "text128", ["-t", "15", "-w", "8"], X3Params(),
         128 << 10, None),
        ("xml-bigwin", "xml", ["-t", "15", "-w", "32"],
         X3Params(window=32 * 1024), 128 << 10, None),
        ("tabular-bigwin", "tabular", ["-t", "15", "-w", "32"],
         X3Params(window=32 * 1024), 128 << 10, None),
        ("binary", "binary", ["-t", "15", "-w", "8"], X3Params(), 128 << 10,
         None),
        ("binary-4mb", "binary4", ["-t", "15", "-w", "8"], X3Params(),
         4 << 20, caps_4mb),  # reference side: measured offline (see below)
        # full-corpus sweep (config #4 single-chip proxy) — opt-in: the
        # reference side alone takes ~3-10 min on these bytes
        ("sweep", "sweep", ["-t", "15", "-w", "8"], X3Params(), 128 << 10,
         None),
    ]
    rows = []
    for name, ckey, rargs, params, bb, ccaps in CONFIGS:
        if want and name not in want and ckey not in want:
            continue
        if not want and name == "sweep":
            continue  # opt-in (slow reference side); see CONFIGS comment
        data = corp.get(ckey)
        if data is None:
            log(f"{name}: corpus missing, skipped")
            continue
        log(f"config {name}: {len(data)} bytes, block {bb >> 10} KiB ...")
        try:
            (ratio, enc, dec, payloads, tc,
             engines) = run_ours(data, params, bb, ccaps)
        except Exception as e:
            log(f"{name}: OURS FAILED {type(e).__name__}: {str(e)[:200]}")
            continue
        log(f"  ours: ratio {ratio:.4f} enc {enc:.4f} MB/s dec {dec:.4f} "
            f"MB/s (compile {tc:.0f}s, engines {engines})")
        if name == "binary-4mb":
            # measured offline on these exact bytes (instrumented build,
            # /tmp/ref4mb.log 2026-08-17): encode 1450.9 s for 4 MiB,
            # ratio 6.2626; decode not run (same O(state) scans apply)
            rratio, renc, rdec = 6.2626, 4194304 / 1450.9 / 1e6, float("nan")
        else:
            rratio, renc, rdec, _ = run_reference(binp, data, rargs)
        log(f"  ref : ratio {rratio:.4f} enc {renc:.4f} MB/s dec {rdec:.4f} MB/s")
        blocks = [data[i : i + bb] for i in range(0, len(data), bb)]
        # C-binary cross-decode of a 4 MB stream takes ~25 min at the
        # reference's decode rate; format parity is already covered by the
        # golden/differential suite, so the 4 MB config skips it
        nx = 0 if name == "binary-4mb" else len(blocks)
        xok = cross_decode(binp, payloads[:nx], blocks[:nx]) if nx else None
        log("  C-binary cross-decode of our streams: "
            + ("OK" if xok else "skipped" if xok is None else "FAIL"))
        rows.append(dict(
            config=name, bytes=len(data), block_kib=bb >> 10,
            ours_ratio=round(ratio, 4), ours_enc_mbs=round(enc, 4),
            ours_dec_mbs=round(dec, 4), engines=engines,
            ref_ratio=round(rratio, 4),
            ref_enc_mbs=round(renc, 4), ref_dec_mbs=round(rdec, 4),
            cross_decode_ok=xok,
        ))
    print(json.dumps(rows, indent=1), flush=True)


if __name__ == "__main__":
    main()
