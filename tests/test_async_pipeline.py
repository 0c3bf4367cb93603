"""Async pipeline (align_batch_launch / _mid / _finish) == align_batch.

The async API exists so a driver can overlap batch k's host tail (downloads,
reverse passes, tracebacks) with batch k+1's device compute; the reference
has no such stage split (its loop is strictly serial, ref: src/main.c:462-535),
so the contract is simply bit-identical results AND bit-identical stderr
warning text to the synchronous path.  Streaming-suboptimal leaves are
async-eligible (their window re-runs run at the mid stage), so long-target
runs keep cross-batch overlap too.
"""

import os

import numpy as np
import pytest

from ssw_tpu import pipeline


def _dna_mat(match=2, mismatch=2):
    mat = np.zeros((5, 5), np.int8)
    for i in range(4):
        for j in range(4):
            mat[i, j] = match if i == j else -mismatch
    return mat


def _mk_reads(rng, ref, n_reads, lmin, lmax, sub_rate, n=5):
    reads = []
    R = len(ref)
    for _ in range(n_reads):
        ln = int(rng.integers(lmin, lmax))
        off = int(rng.integers(0, max(R - ln, 1)))
        rd = ref[off:off + ln].copy()
        m = rng.random(ln) < sub_rate
        rd[m] = rng.integers(0, n - 1, int(m.sum()))
        reads.append(rd.astype(np.int32))
    return reads


def _mixed_req(seed=3, flag=0x0F, **kw):
    """Lengths spanning several 64-buckets -> multiple async leaves."""
    rng = np.random.default_rng(seed)
    ref = rng.integers(0, 4, 2500).astype(np.int32)
    reads = (_mk_reads(rng, ref, 6, 20, 60, 0.06) +
             _mk_reads(rng, ref, 6, 80, 140, 0.06) +
             _mk_reads(rng, ref, 6, 150, 230, 0.06))
    return pipeline.BatchRequest(
        reads=reads, ref=ref, mat=_dna_mat(), gapO=3, gapE=1, flag=flag,
        mask_len=[max(len(r) // 2, 15) for r in reads], **kw)


def _assert_same(sync, got):
    assert len(sync) == len(got)
    for i, (a, b) in enumerate(zip(sync, got)):
        if a is None or b is None:
            assert a is None and b is None, i
            continue
        assert vars(a) == vars(b), (i, vars(a), vars(b))


def _drive(req, backend):
    pend = pipeline.align_batch_launch(req, backend)
    pipeline.align_batch_mid(pend)
    return pipeline.align_batch_finish(pend)


@pytest.mark.parametrize("backend", [
    "scan", pytest.param("pallas", marks=pytest.mark.nightly)])
def test_async_parity_mixed_lengths(backend, capsys):
    req = _mixed_req()
    sync = pipeline.align_batch(req, backend)
    err_sync = capsys.readouterr().err
    got = _drive(req, backend)
    err_async = capsys.readouterr().err
    _assert_same(sync, got)
    assert err_async == err_sync


@pytest.mark.parametrize("backend", [
    "scan", pytest.param("pallas", marks=pytest.mark.nightly)])
def test_async_streaming_leaves(backend, capsys):
    """Forced-streaming leaves must stay async (no sync fallback) and stay
    bit-identical, warnings included."""
    prev = os.environ.get("SSW_TPU_STREAM_SUBOPT")
    os.environ["SSW_TPU_STREAM_SUBOPT"] = "1"
    try:
        req = _mixed_req(seed=9)
        sync = pipeline.align_batch(req, backend)
        err_sync = capsys.readouterr().err
        pend = pipeline.align_batch_launch(req, backend)
        assert pend.results is None, "streaming leaf fell back to sync"
        got = pipeline.align_batch_finish(pend)
        err_async = capsys.readouterr().err
    finally:
        if prev is None:
            os.environ.pop("SSW_TPU_STREAM_SUBOPT", None)
        else:
            os.environ["SSW_TPU_STREAM_SUBOPT"] = prev
    _assert_same(sync, got)
    assert err_async == err_sync


def test_async_word_rerun_streaming(capsys):
    """Overflowing reads (word rerun) inside a forced-streaming async leaf:
    the blockmax splice at mid must match the sync path exactly."""
    rng = np.random.default_rng(21)
    ref = rng.integers(0, 4, 2600).astype(np.int32)
    reads = (_mk_reads(rng, ref, 4, 140, 200, 0.0) +   # overflow byte tier
             _mk_reads(rng, ref, 4, 20, 60, 0.05))
    req = pipeline.BatchRequest(
        reads=reads, ref=ref, mat=_dna_mat(), gapO=3, gapE=1, flag=0x0F,
        mask_len=[max(len(r) // 2, 15) for r in reads])
    prev = os.environ.get("SSW_TPU_STREAM_SUBOPT")
    os.environ["SSW_TPU_STREAM_SUBOPT"] = "1"
    try:
        sync = pipeline.align_batch(req, "scan")
        capsys.readouterr()
        got = _drive(req, "scan")
    finally:
        if prev is None:
            os.environ.pop("SSW_TPU_STREAM_SUBOPT", None)
        else:
            os.environ["SSW_TPU_STREAM_SUBOPT"] = prev
    _assert_same(sync, got)


def test_sync_fallback_paths(capsys):
    # gapO <= gapE routes to the oracle fallback: launch must return a
    # completed _Pending with identical results
    req = _mixed_req(seed=5)
    req = pipeline.BatchRequest(
        reads=req.reads, ref=req.ref, mat=req.mat, gapO=1, gapE=2,
        flag=0x0F, mask_len=req.mask_len)
    sync = pipeline.align_batch(req, "scan")
    err_sync = capsys.readouterr().err
    pend = pipeline.align_batch_launch(req, "scan")
    assert pend.results is not None
    got = pipeline.align_batch_finish(pend)
    err_async = capsys.readouterr().err
    _assert_same(sync, got)
    assert err_async == err_sync


def test_sync_fallback_score_size0(capsys):
    """score_size=0 (byte-only, NULL on overflow) is a synchronous path;
    its stderr warning must fire exactly once per overflowing read."""
    rng = np.random.default_rng(31)
    ref = rng.integers(0, 4, 1500).astype(np.int32)
    reads = _mk_reads(rng, ref, 2, 150, 200, 0.0)  # overflow -> None
    req = pipeline.BatchRequest(
        reads=reads, ref=ref, mat=_dna_mat(), gapO=3, gapE=1, flag=0x0F,
        mask_len=[15, 15], score_size=0)
    sync = pipeline.align_batch(req, "scan")
    err_sync = capsys.readouterr().err
    pend = pipeline.align_batch_launch(req, "scan")
    assert pend.results is not None  # score_size != 2 never goes async
    got = pipeline.align_batch_finish(pend)
    err_async = capsys.readouterr().err
    _assert_same(sync, got)
    assert err_async == err_sync
    assert err_sync.count("score_size") == 2


def test_detail_mask_suppresses_traceback_only(capsys):
    """detail=False reads lose ONLY the cigar (the -r loser case: the
    reference computes it but never prints it); begins, score2 and the
    miss-a-part warning are unchanged."""
    req = _mixed_req(seed=7)
    B = len(req.reads)
    sync = pipeline.align_batch(req, "scan")
    err_sync = capsys.readouterr().err
    detail = np.arange(B) % 2 == 0
    pend = pipeline.align_batch_launch(req, "scan")
    got = pipeline.align_batch_finish(pend, detail=detail)
    err_async = capsys.readouterr().err
    assert err_async == err_sync  # warnings fire for losers too
    assert any(r.cigar for r in sync), "test needs at least one cigar"
    for i, (a, b) in enumerate(zip(sync, got)):
        if detail[i]:
            assert vars(a) == vars(b), i
        else:
            assert b.cigar == []
            da, db = dict(vars(a)), dict(vars(b))
            da.pop("cigar"), db.pop("cigar")
            assert da == db, i


def test_cross_batch_overlap_order(capsys):
    """launch(A), launch(B), finish(A), finish(B) — the driver's real
    interleaving — matches serial sync execution, warnings in order."""
    req_a = _mixed_req(seed=13)
    req_b = _mixed_req(seed=17)
    sync_a = pipeline.align_batch(req_a, "scan")
    sync_b = pipeline.align_batch(req_b, "scan")
    err_sync = capsys.readouterr().err
    pend_a = pipeline.align_batch_launch(req_a, "scan")
    pend_b = pipeline.align_batch_launch(req_b, "scan")
    got_a = pipeline.align_batch_finish(pend_a)
    got_b = pipeline.align_batch_finish(pend_b)
    err_async = capsys.readouterr().err
    _assert_same(sync_a, got_a)
    _assert_same(sync_b, got_b)
    assert err_async == err_sync


def test_scores_accessor():
    req = _mixed_req(seed=19)
    pend = pipeline.align_batch_launch(req, "scan")
    scores = pipeline.align_batch_scores(pend)
    res = pipeline.align_batch_finish(pend)
    want = np.array([0 if r is None else r.score1 for r in res])
    np.testing.assert_array_equal(scores, want)


def test_streaming_threshold_backend_aware():
    """Pallas prefers blockmax streaming once the target passes
    STREAM_MIN_COLS (the kernel is faster without the per-column
    cross-lane reduce); scan only streams when memory forces it."""
    big = pipeline.STREAM_MIN_COLS
    assert not pipeline._use_streaming(4096, 128, "pallas")
    assert pipeline._use_streaming(big, 128, "pallas")
    assert not pipeline._use_streaming(big, 128, "scan")
    # memory pressure still flips scan on (10 Mbp target)
    assert pipeline._use_streaming(10 << 20, 128, "scan")
    # env override beats both heuristics
    prev = os.environ.get("SSW_TPU_STREAM_SUBOPT")
    try:
        os.environ["SSW_TPU_STREAM_SUBOPT"] = "0"
        assert not pipeline._use_streaming(big, 128, "pallas")
        os.environ["SSW_TPU_STREAM_SUBOPT"] = "1"
        assert pipeline._use_streaming(4096, 128, "scan")
    finally:
        if prev is None:
            os.environ.pop("SSW_TPU_STREAM_SUBOPT", None)
        else:
            os.environ["SSW_TPU_STREAM_SUBOPT"] = prev
