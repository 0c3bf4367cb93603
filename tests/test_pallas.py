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
