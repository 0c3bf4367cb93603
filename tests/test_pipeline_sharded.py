"""align_batch_sharded (full pipeline over a (data x seq) mesh) must be
bit-identical to the single-device align_batch, including CIGARs, on the
virtual 8-device CPU mesh."""

import numpy as np
import jax
import pytest

from ssw_tpu import pipeline
from ssw_tpu.parallel import mesh as mesh_lib


def _fields(r):
    if r is None:
        return None
    return (r.score1, r.score2, r.ref_begin1, r.ref_end1, r.read_begin1,
            r.read_end1, r.ref_end2, r.flag, list(r.cigar or []))


def _mk_problem(seed=11, B=13, R=1500, mismatch=2):
    rng = np.random.default_rng(seed)
    mat = np.zeros((5, 5), np.int8)
    for i in range(4):
        for j in range(4):
            mat[i, j] = 2 if i == j else -mismatch
    ref = rng.integers(0, 4, R).astype(np.int32)
    reads = []
    for _ in range(B):
        ln = int(rng.integers(30, 120))
        off = int(rng.integers(0, R - ln))
        r = ref[off:off + ln].copy()
        m = rng.random(ln) < 0.1
        r[m] = rng.integers(0, 4, int(m.sum()))
        reads.append(r.astype(np.int32))
    return reads, ref, mat


@pytest.mark.parametrize("data,seq,mismatch", [
    (2, 4, 2),   # quirk-free penalties
    (4, 2, 5),   # quirk path (min(mat) < -2*gapE)
])
def test_sharded_pipeline_matches_single(data, seq, mismatch):
    if len(jax.devices()) < data * seq:
        pytest.skip("needs 8 virtual devices")
    reads, ref, mat = _mk_problem(mismatch=mismatch)
    req = pipeline.BatchRequest(
        reads=reads, ref=ref, mat=mat, gapO=3, gapE=1, flag=0x0F,
        mask_len=[max(len(r) // 2, 15) for r in reads])
    want = pipeline.align_batch(req, backend="scan")
    m = mesh_lib.make_mesh(data=data, seq=seq)
    got = pipeline.align_batch_sharded(req, m)
    assert len(want) == len(got)
    for w, g in zip(want, got):
        assert _fields(w) == _fields(g)


def test_sharded_score_size0_returns_none_on_overflow():
    """score_size=0 must return None for byte-overflowing reads in the
    sharded path exactly like align_batch (ref: NULL at src/ssw.c:887-891)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    rng = np.random.default_rng(2)
    mat = np.zeros((5, 5), np.int8)
    for i in range(4):
        for j in range(4):
            mat[i, j] = 4 if i == j else -2
    ref = rng.integers(0, 4, 512).astype(np.int32)
    overflow = ref[10:110].copy()          # score 400 > 255
    small = ref[200:240].copy()            # score 160 < 255
    req = pipeline.BatchRequest(reads=[overflow, small], ref=ref, mat=mat,
                                gapO=3, gapE=1, flag=0x0F, mask_len=15,
                                score_size=0)
    want = pipeline.align_batch(req, backend="scan")
    assert want[0] is None and want[1] is not None
    m = mesh_lib.make_mesh(data=2, seq=2)
    got = pipeline.align_batch_sharded(req, m)
    assert got[0] is None
    assert _fields(got[1]) == _fields(want[1])


def test_padding_duplicates_emit_no_extra_warnings(capsys):
    """Shape-stability padding (duplicates of read 0) must not multiply the
    library's flag=2 stderr warning or any per-read work."""
    import io
    import contextlib
    reads, ref, mat = _mk_problem(seed=21, B=3)  # B=3 -> padded to 64 rows
    req = pipeline.BatchRequest(
        reads=reads, ref=ref, mat=mat, gapO=3, gapE=1, flag=0x0F,
        mask_len=[max(len(r) // 2, 15) for r in reads])
    buf = io.StringIO()
    with contextlib.redirect_stderr(buf):
        res = pipeline.align_batch(req, backend="pallas")
    assert len(res) == 3
    warn = buf.getvalue().count("may miss a small part")
    # at most one warning per real read, never one per padded row
    assert warn <= 3


def test_sharded_pipeline_word_rerun():
    """Force a byte-tier overflow (long perfect read, score > 255) so the
    word-geometry rerun path is exercised on the mesh."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    rng = np.random.default_rng(5)
    mat = np.zeros((5, 5), np.int8)
    for i in range(4):
        for j in range(4):
            mat[i, j] = 4 if i == j else -2
    ref = rng.integers(0, 4, 1024).astype(np.int32)
    perfect = ref[100:260].copy()          # score 160*4 = 640 > 255
    noisy = ref[300:380].copy()
    noisy[::7] = (noisy[::7] + 1) % 4
    reads = [perfect.astype(np.int32), noisy.astype(np.int32)]
    req = pipeline.BatchRequest(reads=reads, ref=ref, mat=mat, gapO=3,
                                gapE=1, flag=0x0F, mask_len=[80, 40])
    want = pipeline.align_batch(req, backend="scan")
    assert want[0].score1 == 640
    m = mesh_lib.make_mesh(data=2, seq=2)
    got = pipeline.align_batch_sharded(req, m)
    for w, g in zip(want, got):
        assert _fields(w) == _fields(g)


def test_sharded_minority_overflow_subset_rerun():
    """Mixed batch where only a few reads overflow the byte range: the
    sharded path now reruns just that subset (speculative tier masks +
    subset rerun, VERDICT round-1 item 6) and must stay bit-identical to
    align_batch."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(5)
    mat = np.zeros((5, 5), np.int8)
    for i in range(4):
        for j in range(4):
            mat[i, j] = 2 if i == j else -2
    R = 2000
    ref = rng.integers(0, 4, R).astype(np.int32)
    reads = []
    for i in range(11):
        if i < 3:
            # long exact match -> score ~ 2*len > 255: overflows
            ln = 200
        else:
            ln = int(rng.integers(30, 100))
        off = int(rng.integers(0, R - ln))
        r = ref[off:off + ln].copy()
        if i >= 3:
            m = rng.random(ln) < 0.08
            r[m] = rng.integers(0, 4, int(m.sum()))
        reads.append(r.astype(np.int32))
    req = pipeline.BatchRequest(
        reads=reads, ref=ref, mat=mat, gapO=3, gapE=1, flag=0x0F,
        mask_len=[max(len(r) // 2, 15) for r in reads])
    want = pipeline.align_batch(req, backend="scan")
    # some but not all reads overflow in this workload
    scores = [w.score1 for w in want]
    assert any(s >= 255 for s in scores) and any(s < 255 for s in scores)
    m = mesh_lib.make_mesh(data=2, seq=4)
    got = pipeline.align_batch_sharded(req, m)
    for w, g in zip(want, got):
        assert _fields(w) == _fields(g)
