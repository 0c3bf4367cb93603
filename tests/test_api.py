"""Public API parity: the C++-wrapper-compatible Aligner must reproduce the
reference example.cpp output (captured from the compiled reference), and the
C-API-style align() must agree with the oracle."""

import numpy as np

import ssw_tpu
from ssw_tpu import api
from ssw_tpu.core import oracle
from ssw_tpu.core.encoding import dna_matrix


def test_cpp_example_parity():
    """ref: src/example.cpp:22-53 — golden values from the compiled
    reference C++ wrapper."""
    ref = "CAGCCTTTCTGACCCGGAAATCAAAATAGGCACAACAAA"
    query = "CTGAGCCGGTAAATC"
    aligner = api.Aligner()
    filt = api.Filter()
    flag, al = aligner.align(query, ref, filt, mask_len=15)
    assert al.sw_score == 21
    assert al.sw_score_next_best == 8
    assert al.ref_begin == 8
    assert al.ref_end == 21
    assert al.query_begin == 0
    assert al.query_end == 14
    assert al.ref_end_next_best == 4
    assert al.mismatches == 2
    assert al.cigar_string == "4=1X4=1I5="
    assert flag == 0


def test_cpp_softclip_string():
    ref = "TTTTTACGTACGTACGTTTTT"
    query = "GGACGTACGTACGTGG"
    aligner = api.Aligner()
    _, al = aligner.align(query, ref, api.Filter(), mask_len=15)
    assert al.cigar_string.startswith("2S")
    assert al.cigar_string.endswith("2S")
    assert al.sw_score == 2 * 12


def test_align_matches_oracle():
    rng = np.random.default_rng(5)
    mat = dna_matrix(2, 2)
    ref = rng.integers(0, 4, 200).astype(np.int8)
    read = ref[50:120].copy()
    read[10] = (read[10] + 1) % 4
    got = api.align(read, ref, 3, 1, mat=mat, mask_len=35)
    want = oracle.ssw_align(read, ref, mat, 3, 1, mask_len=35)
    assert got.score1 == want.score1
    assert got.cigar == want.cigar
    assert (got.ref_begin1, got.ref_end1) == (want.ref_begin1, want.ref_end1)


def test_lazy_api_exports():
    assert ssw_tpu.Aligner is api.Aligner
    assert ssw_tpu.Filter is api.Filter


def test_empty_query_fails_individually():
    """An empty query in a batch fails only that entry (flag 0, untouched
    Alignment) — the rest of the batch still aligns
    (ref: src/ssw_cpp.cpp:301 checks per call)."""
    ref = "CAGCCTTTCTGACCCGGAAATCAAAATAGGCACAACAAA"
    aligner = api.Aligner()
    flags, als = aligner.align_batch(["CTGAGCCGGTAAATC", "", "ACGT"], ref,
                                     api.Filter(), mask_len=15)
    assert flags[1] == 0 and als[1].sw_score == 0
    assert als[0].sw_score == 21 and als[0].ref_begin == 8
    assert als[2].sw_score > 0
