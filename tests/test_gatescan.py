"""Exact bounded-radius scan gate (gatescan) parity.

The Pallas kernel truncates its lane prefix-max to GATE_RADIUS whenever a
scalar tracker proves no F-carry can cross that many lanes in the next
column group (pallas_sw._forward_kernel).  This is a pure speed feature:
outputs must be bit-identical to the ungated kernel — and hence to the
scan_sw semantic baseline — in every mode (quirk x blockmax x tier).
Reference for what the scan computes: the lazy-F loop, src/ssw.c:291-326.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from ssw_tpu.ops import common, pallas_sw, scan_sw


def _dna_mat():
    mat = np.zeros((5, 5), np.int8)
    for i in range(4):
        for j in range(4):
            mat[i, j] = 2 if i == j else -2
    return mat


def _mk_args(seed, R=1024, L=256, hot=2, cold=6):
    """hot = embedded high-identity reads (trip the gate for ~read_len +
    score/gapE columns); cold = random reads (stay under the noise
    threshold, keep the gate open)."""
    rng = np.random.default_rng(seed)
    mat_ext = common.extend_matrix(_dna_mat())
    ref = rng.integers(0, 4, R).astype(np.int32)
    read_len = np.concatenate([
        rng.integers(150, 220, hot), rng.integers(20, 120, cold)
    ]).astype(np.int32)
    reads = []
    for i, l in enumerate(read_len):
        if i < hot:
            off = int(rng.integers(0, R - l))
            reads.append(ref[off:off + l].copy())
        else:
            reads.append(rng.integers(0, 4, l).astype(np.int32))
    rp = common.pad_reads(reads, L, 5)
    prof = common.build_profile(rp, read_len, mat_ext)
    geo = common.batch_geometry(read_len, L, word=False)
    return (jnp.asarray(prof), jnp.asarray(ref), jnp.asarray(read_len),
            jnp.asarray(geo.col_mask), jnp.asarray(geo.seg_id),
            jnp.asarray(geo.seg_start)), R


@pytest.mark.parametrize("quirk", [False, True])
def test_gate_parity_vs_scan(quirk):
    args, R = _mk_args(3)
    assert pallas_sw.gate_sub_for(256, 3, 1, 2) == 2  # gate is ON here
    want = scan_sw.forward_shared_ref(*args, 3, 1, quirk)
    got = pallas_sw.forward_shared_ref(*args, 3, 1, quirk, max_sub=2)
    for w, g, name in zip(want, got, ("score", "end_ref", "end_read",
                                      "maxcol")):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g),
                                      err_msg=name)


def test_gate_parity_blockmax():
    args, R = _mk_args(11)
    want = scan_sw.forward_shared_ref(*args, 3, 1, False)
    want_bm = scan_sw.blockmax_reduce(want[3], R)
    got = pallas_sw.forward_shared_ref(*args, 3, 1, False, max_sub=2,
                                       blockmax=True, valid_len=R)
    for w, g, name in zip(want[:3], got[:3], ("score", "end_ref",
                                              "end_read")):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g),
                                      err_msg=name)
    np.testing.assert_array_equal(np.asarray(want_bm), np.asarray(got[3]))


def test_gate_parity_all_cold():
    """Every group safe (random reads only): the truncated scan runs for
    essentially the whole target and must still be exact."""
    args, R = _mk_args(17, hot=0, cold=8)
    want = scan_sw.forward_shared_ref(*args, 3, 1, False)
    got = pallas_sw.forward_shared_ref(*args, 3, 1, False, max_sub=2)
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))


def test_gate_off_env(monkeypatch):
    monkeypatch.setenv("SSW_TPU_GATESCAN", "0")
    assert pallas_sw.gate_sub_for(256, 3, 1, 2) is None


def test_gate_threshold_guards():
    # nothing to truncate at L <= radius
    assert pallas_sw.gate_sub_for(64, 3, 1, 2) is None
    # threshold <= 0: 16 * max_sub growth swallows the radius budget
    # (e.g. BLOSUM50's max |score| = 15: 5 + 63*3 - 16*15 = -46)
    assert pallas_sw.gate_sub_for(256, 5, 3, 15) is None
    # unknown matrix bound -> off
    assert pallas_sw.gate_sub_for(256, 3, 1, None) is None
    # generous gaps widen the budget enough for proteins
    assert pallas_sw.gate_sub_for(256, 10, 10, 15) == 15
