"""Edge-shape behavior: the batched pipeline must agree with the oracle
(itself vetted against reference-generated vectors) on degenerate inputs."""

import numpy as np
import pytest

from ssw_tpu import pipeline
from ssw_tpu.core import oracle


def _fields(r):
    if r is None:
        return None
    return (r.score1, r.score2, r.ref_begin1, r.ref_end1, r.read_begin1,
            r.read_end1, r.ref_end2, r.flag, list(r.cigar or []))


def _mat(match=2, mismatch=2):
    m = np.zeros((5, 5), np.int8)
    for i in range(4):
        for j in range(4):
            m[i, j] = match if i == j else -mismatch
    return m


def _check(reads, ref, mat=None, gapO=3, gapE=1, mask_len=15):
    mat = _mat() if mat is None else mat
    req = pipeline.BatchRequest(
        reads=[np.asarray(r, np.int32) for r in reads],
        ref=np.asarray(ref, np.int32), mat=mat, gapO=gapO, gapE=gapE,
        flag=0x0F, mask_len=mask_len)
    got = pipeline.align_batch(req, backend="scan")
    for b, (r, g) in enumerate(zip(reads, got)):
        ml = mask_len[b] if isinstance(mask_len, list) else mask_len
        want = oracle.ssw_align(np.asarray(r, np.int32),
                                np.asarray(ref, np.int32), mat, gapO, gapE,
                                flag=0x0F, mask_len=ml)
        assert _fields(want) == _fields(g), (r, ref)


def test_single_base_read_and_ref():
    _check([[0]], [0])          # match
    _check([[0]], [1])          # mismatch only -> score 0
    _check([[2], [3]], [2, 3, 2])


def test_read_longer_than_ref():
    rng = np.random.default_rng(0)
    ref = rng.integers(0, 4, 10)
    reads = [np.concatenate([ref, rng.integers(0, 4, 30)]),
             rng.integers(0, 4, 40)]
    _check(reads, ref)


def test_all_ambiguous_read_scores_zero():
    # code 4 scores 0 against everything in the ssw_test matrix
    _check([[4] * 20], np.random.default_rng(1).integers(0, 4, 50))


def test_tie_between_columns_keeps_first():
    # two identical perfect hits; end_ref must be the first (strict-max
    # update, ref: src/ssw.c:327-334) and score2 the second
    ref = np.array([0, 1, 2, 3] * 2 + [1, 1, 1, 1] * 8 + [0, 1, 2, 3] * 2,
                   np.int32)
    read = np.array([0, 1, 2, 3], np.int32)
    req = pipeline.BatchRequest(reads=[read], ref=ref, mat=_mat(), gapO=3,
                                gapE=1, flag=0x0F, mask_len=15)
    got = pipeline.align_batch(req, backend="scan")[0]
    want = oracle.ssw_align(read, ref, _mat(), 3, 1, flag=0x0F, mask_len=15)
    assert _fields(got) == _fields(want)
    assert got.ref_end1 < 10


def test_mixed_lengths_one_batch():
    rng = np.random.default_rng(7)
    ref = rng.integers(0, 4, 300)
    reads = [ref[10:11], ref[20:180], ref[5:50], np.array([4], np.int32),
             ref[250:299][::-1].copy()]
    _check(reads, ref, mask_len=[0, 80, 22, 0, 24])


def test_long_read_word_tier():
    """A 1.5kb perfect read overflows the byte tier (score 3000) and must
    come back via the word-geometry rerun identical to the oracle."""
    rng = np.random.default_rng(3)
    ref = rng.integers(0, 4, 4000)
    read = ref[1000:2500].copy()
    _check([read], ref, mask_len=750)


def test_gap_open_equals_extend_fallback():
    """gapO <= gapE routes to the bug-compatible oracle path."""
    rng = np.random.default_rng(9)
    ref = rng.integers(0, 4, 120)
    read = ref[20:80].copy()
    read[10:13] = (read[10:13] + 1) % 4
    _check([read], ref, gapO=1, gapE=1, mask_len=30)
