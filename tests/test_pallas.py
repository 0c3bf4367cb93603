"""Pallas kernel parity vs the scan reference path (interpret mode on CPU).

The scan path is itself verified against the reference-generated vectors
(tests/test_oracle_vectors.py), so scan == pallas here implies reference
parity for the TPU kernel, for both the int32 and int16 tiers."""

import numpy as np
import jax.numpy as jnp
import pytest

from ssw_tpu.ops import common, pallas_sw, scan_sw


def _mk(B, L, R, max_sub, seed, word):
    rng = np.random.default_rng(seed)
    n = 5
    mat = np.zeros((n, n), np.int8)
    for i in range(n - 1):
        for j in range(n - 1):
            mat[i, j] = max_sub if i == j else -max_sub
    mat_ext = common.extend_matrix(mat)
    ref = rng.integers(0, n - 1, R).astype(np.int32)
    read_len = rng.integers(max(L // 3, 2), L - 20, B).astype(np.int32)
    reads = [rng.integers(0, n - 1, l).astype(np.int32) for l in read_len]
    rp = common.pad_reads(reads, L, n)
    prof = common.build_profile(rp, read_len, mat_ext)
    geo = common.batch_geometry(read_len, L, word=word)
    args = (jnp.asarray(prof), jnp.asarray(ref), jnp.asarray(read_len),
            jnp.asarray(geo.col_mask), jnp.asarray(geo.seg_id),
            jnp.asarray(geo.seg_start))
    return args, mat


@pytest.mark.parametrize("max_sub,gapO,gapE,quirk,word", [
    (2, 3, 1, False, False),    # int16 tier, byte geometry
    (2, 3, 1, False, True),     # int16 tier, word geometry
    (3, 5, 2, False, False),    # int16 tier, other penalties
    (5, 3, 1, True, False),     # quirk -> int32 tier
    (127, 3, 1, False, False),  # range guard -> int32 tier
])
def test_pallas_matches_scan(max_sub, gapO, gapE, quirk, word):
    args, mat = _mk(B=8, L=128, R=512, max_sub=max_sub, seed=max_sub * 7,
                    word=word)
    want = scan_sw.forward_shared_ref(*args, gapO, gapE, quirk)
    got = pallas_sw.forward_shared_ref(*args, gapO, gapE, quirk,
                                       max_sub=max_sub)
    for w, g, name in zip(want, got, ("score", "end_ref", "end_read",
                                      "maxcol")):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g),
                                      err_msg=name)


def test_batch_chunking_matches_unchunked(monkeypatch):
    """Oversized batches split into sweet-spot chunks (OPT_LANES); results
    must concatenate to exactly the unchunked output."""
    args, mat = _mk(B=12, L=128, R=512, max_sub=2, seed=3, word=False)
    want = pallas_sw.forward_shared_ref(*args, 3, 1, False, max_sub=2)
    monkeypatch.setattr(pallas_sw, "OPT_LANES", 5 * 128)  # -> chunks of 8+4
    got = pallas_sw.forward_shared_ref(*args, 3, 1, False, max_sub=2)
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))


def test_i16_tier_selection():
    assert pallas_sw.i16_exact(256, 3, 1, 2, quirk=False)
    assert not pallas_sw.i16_exact(256, 3, 1, 2, quirk=True)
    assert not pallas_sw.i16_exact(256, 3, 1, None, quirk=False)
    assert not pallas_sw.i16_exact(256, 3, 62, 2, quirk=False)
    assert not pallas_sw.i16_exact(128, 3, 1, 127, quirk=False)
    assert pallas_sw.i16_exact(128, 3, 1, 100, quirk=False)


def _mk_perread(B, L, W, max_sub, seed, word, with_term):
    rng = np.random.default_rng(seed)
    n = 5
    mat = np.zeros((n, n), np.int8)
    for i in range(n - 1):
        for j in range(n - 1):
            mat[i, j] = max_sub if i == j else -max_sub
    mat_ext = common.extend_matrix(mat)
    read_len = rng.integers(max(L // 3, 2), L - 20, B).astype(np.int32)
    reads = [rng.integers(0, n - 1, l).astype(np.int32) for l in read_len]
    rp = common.pad_reads(reads, L, n)
    prof = common.build_profile(rp, read_len, mat_ext)
    geo = common.batch_geometry(read_len, L, word=word)
    # per-read windows: mostly real codes, tail padded with the virtual n
    refw = np.full((B, W), n, np.int32)
    for b in range(B):
        w = int(rng.integers(W // 2, W))
        refw[b, :w] = rng.integers(0, n - 1, w)
        # embed the read so positive scores (and terminate hits) exist
        s = int(rng.integers(0, max(1, w - read_len[b])))
        take = min(read_len[b], w - s)
        refw[b, s:s + take] = reads[b][:take]
    term = None
    if with_term:
        # realistic terminate: the actual best score for half the reads
        base = scan_sw.forward_perread_ref(
            jnp.asarray(prof), jnp.asarray(refw), jnp.asarray(read_len),
            jnp.asarray(geo.col_mask), jnp.asarray(geo.seg_id),
            jnp.asarray(geo.seg_start), 3, 1, False)
        t = np.asarray(base[0]).copy()
        t[::2] = -1
        term = jnp.asarray(t, jnp.int32)
    args = (jnp.asarray(prof), jnp.asarray(refw), jnp.asarray(read_len),
            jnp.asarray(geo.col_mask), jnp.asarray(geo.seg_id),
            jnp.asarray(geo.seg_start))
    return args, term


@pytest.mark.parametrize("max_sub,gapO,gapE,quirk,word,with_term", [
    (2, 3, 1, False, False, False),
    (2, 3, 1, False, True, True),
    (3, 5, 2, False, False, True),
    (5, 3, 1, True, False, False),
    (5, 3, 1, True, False, True),
])
def test_perread_pallas_matches_scan(max_sub, gapO, gapE, quirk, word,
                                     with_term):
    """Reverse-pass (per-read-window) kernel vs the scan twin, incl. the
    terminate-at-score1 gating (ref: src/ssw.c:339-341)."""
    args, term = _mk_perread(B=8, L=128, W=200, max_sub=max_sub,
                             seed=max_sub * 13, word=word,
                             with_term=with_term)
    want = scan_sw.forward_perread_ref(*args, gapO, gapE, quirk,
                                       terminate=term)
    got = pallas_sw.forward_perread_ref(*args, gapO, gapE, quirk,
                                        terminate=term)
    for w, g, name in zip(want, got, ("score", "end_ref", "end_read")):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g),
                                      err_msg=name)


def test_perread_chunking_matches_unchunked(monkeypatch):
    args, term = _mk_perread(B=12, L=128, W=200, max_sub=2, seed=9,
                             word=False, with_term=True)
    want = pallas_sw.forward_perread_ref(*args, 3, 1, False, terminate=term)
    monkeypatch.setattr(pallas_sw, "OPT_LANES", 5 * 128)
    got = pallas_sw.forward_perread_ref(*args, 3, 1, False, terminate=term)
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))
