"""Batched native traceback (sswtpu_banded_cigar_batch): one threaded C++
call must reproduce the per-pair path exactly (VERDICT round-1 item 5)."""

import numpy as np
import pytest

from ssw_tpu.core import oracle
from ssw_tpu.core.encoding import dna_matrix
from ssw_tpu.ops import banded


def _pairs(seed, n_pairs):
    rng = np.random.default_rng(seed)
    mat = dna_matrix(2, 2)
    out = []
    for _ in range(n_pairs):
        rl = int(rng.integers(20, 300))
        ref = rng.integers(0, 4, rl).astype(np.int32)
        ln = int(rng.integers(10, min(200, rl)))
        s = int(rng.integers(0, rl - ln + 1))
        read = ref[s:s + ln].copy()
        idx = rng.integers(0, ln, max(1, ln // 10))
        read[idx] = rng.integers(0, 4, len(idx))
        r = oracle.ssw_align(read, ref, mat, 3, 1, flag=0x0F, mask_len=15)
        if r.score1 > 0 and r.ref_begin1 >= 0:
            out.append((ref[r.ref_begin1:r.ref_end1 + 1],
                        read[r.read_begin1:r.read_end1 + 1], r.score1))
    return out, mat


@pytest.mark.skipif(not banded.native_available(),
                    reason="native lib unavailable")
def test_batch_matches_per_pair():
    pairs, mat = _pairs(1, 40)
    assert len(pairs) > 10
    refs = [p[0] for p in pairs]
    reads = [p[1] for p in pairs]
    scores = [p[2] for p in pairs]
    got = banded.banded_cigar_batch(refs, reads, scores, 3, 1, mat)
    want = [banded.banded_cigar(r, q, s, 3, 1, mat)
            for r, q, s in pairs]
    assert got == want
    assert sum(1 for g in got if g) > 10


@pytest.mark.skipif(not banded.native_available(),
                    reason="native lib unavailable")
def test_batch_includes_failures():
    """A bogus (unreachable) score makes the banded verification fail ->
    None, without disturbing neighbors in the batch."""
    pairs, mat = _pairs(2, 10)
    refs = [p[0] for p in pairs]
    reads = [p[1] for p in pairs]
    scores = [p[2] for p in pairs]
    scores[3] = 10 ** 6  # unreachable
    got = banded.banded_cigar_batch(refs, reads, scores, 3, 1, mat)
    assert got[3] is None
    want = [banded.banded_cigar(r, q, s, 3, 1, mat)
            for r, q, s in zip(refs, reads, scores)]
    assert got == want


def test_batch_empty():
    assert banded.banded_cigar_batch([], [], [], 3, 1, dna_matrix(2, 2)) == []
