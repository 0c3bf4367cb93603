"""Batched pipeline parity: align_batch must agree with the oracle (which is
itself vector-verified against the reference C API)."""

import json
import os

import numpy as np
import pytest

from ssw_tpu import pipeline
from ssw_tpu.core import oracle
from ssw_tpu.core.cigar import cigar_to_string
from ssw_tpu.core.encoding import dna_matrix

VEC_PATH = os.path.join(os.path.dirname(__file__), "vectors",
                        "ssw_vectors.jsonl")


def _result_tuple(r):
    if r is None:
        return None
    return (r.score1, r.score2, r.ref_begin1, r.ref_end1, r.read_begin1,
            r.read_end1, r.ref_end2, r.flag, cigar_to_string(r.cigar))


def test_batch_matches_oracle_random():
    rng = np.random.default_rng(7)
    mat = dna_matrix(2, 2)
    ref = rng.integers(0, 4, 300).astype(np.int8)
    reads = []
    for k in range(24):
        ln = int(rng.integers(10, 120))
        if k % 3:
            off = int(rng.integers(0, 300 - ln))
            r = ref[off:off + ln].copy()
            muts = rng.random(ln) < 0.1
            r[muts] = rng.integers(0, 4, muts.sum())
        else:
            r = rng.integers(0, 4, ln).astype(np.int8)
        reads.append(r)
    req = pipeline.BatchRequest(reads=reads, ref=ref, mat=mat, gapO=3,
                                gapE=1, flag=0x0F, filters=0,
                                filterd=2 ** 31 - 1,
                                mask_len=[max(len(r) // 2, 15) for r in reads])
    got = pipeline.align_batch(req, backend="scan")
    for r, read in zip(got, reads):
        want = oracle.ssw_align(read, ref, mat, 3, 1, flag=0x0F,
                                mask_len=max(len(read) // 2, 15))
        assert _result_tuple(r) == _result_tuple(want)


def test_batch_matches_oracle_protein_quirk():
    """Random protein pairs on BLOSUM50 (quirk path: min(mat) < -2*gapE),
    full field compare incl. flag and cigar."""
    from ssw_tpu.core.encoding import BLOSUM50
    rng = np.random.default_rng(13)
    ref = rng.integers(0, 20, 180).astype(np.int8)
    reads = []
    for k in range(12):
        ln = int(rng.integers(12, 80))
        if k % 3:
            off = int(rng.integers(0, 180 - ln))
            r = ref[off:off + ln].copy()
            muts = rng.random(ln) < 0.2
            r[muts] = rng.integers(0, 20, muts.sum())
        else:
            r = rng.integers(0, 20, ln).astype(np.int8)
        reads.append(r)
    req = pipeline.BatchRequest(reads=reads, ref=ref, mat=BLOSUM50, gapO=3,
                                gapE=1, flag=0x0F,
                                mask_len=[max(len(r) // 2, 15)
                                          for r in reads])
    got = pipeline.align_batch(req, backend="scan")
    for r, read in zip(got, reads):
        want = oracle.ssw_align(read, ref, BLOSUM50, 3, 1, flag=0x0F,
                                mask_len=max(len(read) // 2, 15))
        assert _result_tuple(r) == _result_tuple(want)


def _load_vector_subsample():
    with open(VEC_PATH) as f:
        vs = [json.loads(line) for line in f if line.strip()]
    # spread across tags incl. word-tier, flags and protein cases
    picked = []
    seen = {}
    for v in vs:
        k = v["tag"]
        seen.setdefault(k, 0)
        if seen[k] < 5:
            picked.append(v)
            seen[k] += 1
    return picked


@pytest.mark.parametrize("v", _load_vector_subsample(),
                         ids=lambda v: v["tag"])
def test_batch_vector_subsample(v):
    mat = np.array(v["mat"], dtype=np.int8).reshape(v["n"], v["n"])
    req = pipeline.BatchRequest(
        reads=[np.array(v["read"])], ref=np.array(v["ref"]), mat=mat,
        gapO=v["gapO"], gapE=v["gapE"], flag=v["flag"], filters=v["filters"],
        filterd=v["filterd"], mask_len=v["maskLen"],
        score_size=v["score_size"])
    r = pipeline.align_batch(req, backend="scan")[0]
    if v.get("null_result"):
        assert r is None
        return
    got = dict(score1=r.score1, score2=r.score2, ref_begin1=r.ref_begin1,
               ref_end1=r.ref_end1, read_begin1=r.read_begin1,
               read_end1=r.read_end1, ref_end2=r.ref_end2, aflag=r.flag,
               cigar=cigar_to_string(r.cigar))
    assert got == {k: v[k] for k in got}
