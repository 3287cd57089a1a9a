"""Differential test: fused Pallas matcher (interpret mode on CPU) vs the
XLA matcher path, over random dictionary/text states."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from x3tpu.config import MAX_MATCH_LEN, X3Params
from x3tpu.models import dictionary as dm
from x3tpu.ops import match as xm
from x3tpu.ops.match_pallas import match_event_pallas


def _xla_reference(text, p, tlen, d, params):
    active = p < tlen
    W = max(params.window, MAX_MATCH_LEN)
    Wbuf = ((max(W, 64) + 32 + 127) // 128) * 128
    win = xm.gather_window(text, p, Wbuf)
    t32 = win[:, :MAX_MATCH_LEN]
    found, slot, dlen, matchlen = dm.dict_probe(d, t32)
    counts = xm.window_counts(win, params.window)
    fbm = xm.best_match_sweep(counts, win, d, active, params)
    mlen = jnp.clip(jnp.minimum(fbm, tlen - p), 1, MAX_MATCH_LEN)
    dup = dm.dict_has_exact(d, matchlen, mlen)
    return found, slot, dlen, fbm, mlen, dup


def _random_state(seed, L=4, D=64, B=600, W=256, frag_pool=None):
    rng = np.random.default_rng(seed)
    pool = frag_pool or [b"the ", b"quick", b"fox", b"ab", b"compress", b"\x00\x01"]
    text = np.zeros((L, B + W + 192), np.uint8)
    tlen = np.zeros((L,), np.int32)
    for l in range(L):
        parts = []
        while sum(map(len, parts)) < B:
            if rng.random() < 0.7:
                parts.append(pool[rng.integers(len(pool))])
            else:
                parts.append(rng.bytes(rng.integers(1, 6)))
        blob = b"".join(parts)[:B]
        text[l, : len(blob)] = np.frombuffer(blob, np.uint8)
        tlen[l] = len(blob)
    d = dm.dict_init(L, D)
    strs = np.zeros((L, D, 32), np.uint8)
    lens = np.zeros((L, D), np.int32)
    nper = rng.integers(3, D, size=L)
    for l in range(L):
        for t in range(nper[l]):
            frag = pool[rng.integers(len(pool))]
            if rng.random() < 0.3:
                frag = rng.bytes(int(rng.integers(1, 8)))
            strs[l, t, : len(frag)] = np.frombuffer(frag, np.uint8)
            lens[l, t] = len(frag)
    d = d._replace(
        strs=jnp.asarray(strs), lens=jnp.asarray(lens),
        n=jnp.asarray(nper.astype(np.int32)),
    )
    p = np.asarray([int(rng.integers(0, max(tlen[l] - 1, 1))) for l in range(L)],
                   np.int32)
    return jnp.asarray(text), jnp.asarray(p), jnp.asarray(tlen), d


@pytest.mark.parametrize("seed", range(4))
@pytest.mark.parametrize("pset", [
    X3Params(max_match_count=4, window=256),
    X3Params(max_match_count=4, window=256, magic_factor1=0),
    X3Params(max_match_count=2, window=256, magic_factor2=2),
    X3Params(max_match_count=3, window=256, nl_remap=True),
])
def test_pallas_matcher_matches_xla(seed, pset):
    text, p, tlen, d = _random_state(seed)
    want = _xla_reference(text, p, tlen, d, pset)
    got = match_event_pallas(
        text, p, tlen, d.strs, d.lens, d.n, pset, interpret=True
    )
    found_w, slot_w, dlen_w, fbm_w, mlen_w, dup_w = [np.asarray(x) for x in want]
    hit_g, slot_g, dlen_g, fbm_g, mlen_g, dup_g = [np.asarray(x) for x in got]
    np.testing.assert_array_equal(dlen_g, dlen_w, err_msg="dlen")
    np.testing.assert_array_equal(fbm_g, fbm_w, err_msg="fbm")
    np.testing.assert_array_equal(mlen_g, mlen_w, err_msg="mlen")
    np.testing.assert_array_equal(dup_g, dup_w, err_msg="dup")
    # slot only meaningful where found
    np.testing.assert_array_equal(
        np.where(found_w, slot_g, -1), np.where(found_w, slot_w, -1),
        err_msg="slot",
    )
    # hit must equal the XLA-side decision
    p_np, tlen_np = np.asarray(p), np.asarray(tlen)
    nl = dlen_w.copy()
    if pset.nl_remap:
        nl = np.asarray([pset.nl(int(v)) if v > 0 else 0 for v in dlen_w])
    hit_w = found_w & (nl >= fbm_w) & (p_np + dlen_w <= tlen_np)
    np.testing.assert_array_equal(hit_g, hit_w, err_msg="hit")


def test_full_encoder_with_pallas_matcher_interpret():
    """End-to-end: the encoder with the fused matcher (interpreter mode)
    produces bit-identical streams to the spec."""
    import dataclasses

    from x3tpu import codec, spec
    from x3tpu.config import CodecCaps

    params = X3Params(max_match_count=4, window=256)
    caps = CodecCaps(
        dict_cap=256, pair_cap=1024, ctx_items_cap=64, ctx0_items_cap=64,
        block_bytes=2048, matcher="pallas_interpret",
    )
    blocks = [
        (b"interpret-mode check: abcabc abcabc the fox " * 30)[:1200],
        bytes(range(128)) * 6,
    ]
    ours = codec.encode_blocks(blocks, params, caps)
    for i, b in enumerate(blocks):
        assert ours[i] == spec.encode(b, params), f"block {i}"
