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


def _mk_args(seed, R=1024, L=256, hot=2, cold=6, mat=None):
    """hot = embedded high-identity reads (trip the gate for ~read_len +
    score/gapE columns); cold = random reads (stay under the noise
    threshold, keep the gate open)."""
    rng = np.random.default_rng(seed)
    mat_ext = common.extend_matrix(_dna_mat() if mat is None else mat)
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
def test_gate_parity_vs_scan(quirk, monkeypatch):
    # default penalties sit below the noise-ceiling auto-disable; force
    # the tier on so the gated kernel is what parity exercises
    monkeypatch.setenv("SSW_TPU_GATESCAN", "force")
    args, R = _mk_args(3)
    assert pallas_sw.gate_sub_for(256, 3, 1, 2) == 2  # gate is ON here
    want = scan_sw.forward_shared_ref(*args, 3, 1, quirk)
    got = pallas_sw.forward_shared_ref(*args, 3, 1, quirk, max_sub=2)
    for w, g, name in zip(want, got, ("score", "end_ref", "end_read",
                                      "maxcol")):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g),
                                      err_msg=name)


def test_gate_parity_blockmax(monkeypatch):
    monkeypatch.setenv("SSW_TPU_GATESCAN", "force")
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


def test_gate_parity_all_cold(monkeypatch):
    """Every group safe (random reads only): the truncated scan runs for
    essentially the whole target and must still be exact."""
    monkeypatch.setenv("SSW_TPU_GATESCAN", "force")
    args, R = _mk_args(17, hot=0, cold=8)
    want = scan_sw.forward_shared_ref(*args, 3, 1, False)
    got = pallas_sw.forward_shared_ref(*args, 3, 1, False, max_sub=2)
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))


def test_gate_off_env(monkeypatch):
    monkeypatch.setenv("SSW_TPU_GATESCAN", "0")
    assert pallas_sw.gate_sub_for(256, 3, 1, 2) is None
    assert pallas_sw.gate_plan(256, 3, 1, 2) == (None, ())


def test_gate_threshold_guards():
    # nothing to truncate at L <= radius
    assert pallas_sw.gate_sub_for(64, 3, 1, 2) is None
    # unknown matrix bound -> off
    assert pallas_sw.gate_sub_for(256, 3, 1, None) is None
    # generous gaps clear the noise ceiling for proteins
    # (10 + 63*10 - 240 = 400 > 21*15 = 315)
    assert pallas_sw.gate_sub_for(256, 10, 10, 15) == 15
    # the reference README's alternate penalties m1/x3/o5/e2:
    # 5 + 63*2 - 48 = 83 > 21*3 = 63 -> gate auto-ON (measured open
    # ~100% of noise columns at these penalties, BENCH.md)
    assert pallas_sw.gate_plan(256, 5, 2, 3) == (3, (64,))


def test_gate_noise_autodisable(monkeypatch):
    # default penalties m2/x2/o3/e1: threshold 34 < noise ceiling 42 ->
    # the tier could never open on a 32k-lane chunk (measured noise max
    # 55-82); auto-off saves the dead branch (-1.7% measured, BENCH.md)
    assert pallas_sw.gate_plan(256, 3, 1, 2) == (None, ())
    monkeypatch.setenv("SSW_TPU_GATESCAN", "force")
    assert pallas_sw.gate_plan(256, 3, 1, 2) == (2, (64,))


def test_gate_plan_tiers(monkeypatch):
    monkeypatch.setenv("SSW_TPU_GATESCAN", "force")
    # the wide radius-128 tier is measurement-only (its s=128 scan level
    # is a free whole-vreg move): off unless SSW_TPU_GATE2=1
    assert pallas_sw.gate_plan(256, 3, 1, 2) == (2, (64,))
    monkeypatch.setenv("SSW_TPU_GATE2", "1")
    assert pallas_sw.gate_plan(256, 3, 1, 2) == (2, (64, 128))
    # wide tier needs lanes beyond its radius
    assert pallas_sw.gate_plan(128, 3, 1, 2) == (2, (64,))
    # packed rows: the SLOT bound is the effective scan length
    assert pallas_sw.gate_plan(4096, 3, 1, 2, pack_bound=128) == (2, (64,))
    assert pallas_sw.gate_plan(4096, 3, 1, 2, pack_bound=64) == (None, ())
    assert pallas_sw.gate_plan(4096, 3, 1, 2, pack_bound=256) == (2, (64,
                                                                      128))
    # tight threshold <= 0 (BLOSUM50 max |score| = 15: 5 + 63*3 - 16*15 =
    # -46) but the WIDE tier is provable (5 + 127*3 - 240 = 146 > 0)
    assert pallas_sw.gate_plan(256, 5, 3, 15) == (15, (128,))


def test_gate_parity_auto_on():
    """m1/x3/o5/e2 (the reference README's alternate penalties): the gate
    is auto-ON with no env override, engages on ~all noise columns, and
    must stay bit-identical to the scan."""
    mat = np.zeros((5, 5), np.int8)
    for i in range(4):
        for j in range(4):
            mat[i, j] = 1 if i == j else -3
    assert pallas_sw.gate_plan(256, 5, 2, 3) == (3, (64,))
    args, R = _mk_args(29, mat=mat)
    want = scan_sw.forward_shared_ref(*args, 5, 2, False)
    got = pallas_sw.forward_shared_ref(*args, 5, 2, False, max_sub=3)
    for w, g, name in zip(want, got, ("score", "end_ref", "end_read",
                                      "maxcol")):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g),
                                      err_msg=name)


def _strong_mat(v):
    mat = np.zeros((5, 5), np.int8)
    for i in range(4):
        for j in range(4):
            mat[i, j] = v if i == j else -v
    return mat


@pytest.mark.parametrize("quirk", [
    False, pytest.param(True, marks=pytest.mark.nightly)])
def test_gate_parity_wide_only(quirk, monkeypatch):
    """max_sub = 5 kills the tight tier (3 + 63 - 80 < 0) but leaves the
    wide one (3 + 127 - 80 = 50 > 0): the kernel instantiates the
    (128, full) branch pair and must stay bit-identical to the scan."""
    monkeypatch.setenv("SSW_TPU_GATESCAN", "force")
    monkeypatch.setenv("SSW_TPU_GATE2", "1")
    assert pallas_sw.gate_plan(256, 3, 1, 5) == (5, (128,))
    rng = np.random.default_rng(23)
    mat_ext = common.extend_matrix(_strong_mat(5))
    R, L = 1024, 256
    ref = rng.integers(0, 4, R).astype(np.int32)
    read_len = np.array([180, 200, 40, 70, 100, 25], np.int32)
    reads = []
    for i, l in enumerate(read_len):
        if i < 2:  # hot: drives hm through both threshold regions
            off = int(rng.integers(0, R - l))
            reads.append(ref[off:off + l].copy())
        else:
            reads.append(rng.integers(0, 4, l).astype(np.int32))
    rp = common.pad_reads(reads, L, 5)
    prof = common.build_profile(rp, read_len, mat_ext)
    geo = common.batch_geometry(read_len, L, word=False)
    args = (jnp.asarray(prof), jnp.asarray(ref), jnp.asarray(read_len),
            jnp.asarray(geo.col_mask), jnp.asarray(geo.seg_id),
            jnp.asarray(geo.seg_start))
    want = scan_sw.forward_shared_ref(*args, 3, 1, quirk)
    got = pallas_sw.forward_shared_ref(*args, 3, 1, quirk, max_sub=5)
    for w, g, name in zip(want, got, ("score", "end_ref", "end_read",
                                      "maxcol")):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g),
                                      err_msg=name)
