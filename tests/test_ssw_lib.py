"""Tests for the ssw_lib compatibility shim and the Aligner Clear/ReBuild
lifecycle (VERDICT round-1 items 8 / missing 1-2)."""

import numpy as np
import pytest

from ssw_tpu import api, ssw_lib
from ssw_tpu.core.encoding import NT_TABLE, dna_matrix


def enc(s):
    return [int(NT_TABLE[ord(c)]) for c in s]


READ = "CTGAGCCGGTAAATC"
REF = "CAGCCTTTCTGACCCGGAAATCAAAATAGGCACAACAAA"


def test_ssw_lib_reference_usage_pattern():
    """Drive the shim exactly like the reference's pyssw drives CSsw
    (ref: src/pyssw.py:246-279)."""
    ssw = ssw_lib.CSsw("/nonexistent/path/ok/to/ignore")
    mat = dna_matrix(2, 2)
    flat = [int(x) for x in mat.reshape(-1)]
    q = enc(READ)
    r = enc(REF)
    prof = ssw.ssw_init(q, len(q), flat, 5, 2)
    assert prof.contents.nReadLen == len(q)
    assert prof.contents.nN == 5
    assert prof.contents.nBias == 2
    res = ssw.ssw_align(prof, r, len(r), 3, 1, 0x0F, 0, 2 ** 15, 15)
    assert res
    c = res.contents
    # expected values from the reference example (src/example.c header):
    # optimal score 21, cigar 4M1D11M region
    assert c.nScore == 21
    assert c.nRefBeg >= 0 and c.nQryBeg >= 0
    assert c.nCigarLen == len(c.sCigar) and c.nCigarLen > 0
    # same numbers as the native api path
    ar = api.align(np.asarray(q), np.asarray(r), 3, 1, mat=mat)
    assert (c.nScore, c.nScore2, c.nRefBeg, c.nRefEnd, c.nQryBeg,
            c.nQryEnd, c.nRefEnd2) == (
        ar.score1, ar.score2, ar.ref_begin1, ar.ref_end1, ar.read_begin1,
        ar.read_end1, ar.ref_end2)
    assert list(c.sCigar) == list(ar.cigar)
    ssw.align_destroy(res)
    assert not res
    ssw.init_destroy(prof)
    assert not prof


def test_ssw_lib_null_on_score_size_zero_overflow(capsys):
    """score_size=0 + byte overflow returns a NULL-like pointer
    (ref: src/ssw.c:887-891)."""
    ssw = ssw_lib.CSsw()
    q = enc("A" * 200)
    r = enc("A" * 300)
    mat = dna_matrix(2, 2)
    flat = [int(x) for x in mat.reshape(-1)]
    prof = ssw.ssw_init(q, len(q), flat, 5, 0)
    res = ssw.ssw_align(prof, r, len(r), 3, 1, 0, 0, 2 ** 15, 15)
    assert not res


def test_ssw_lib_blosum50_matches_encoding():
    assert len(ssw_lib.lBlosum50) == 24 * 24
    assert ssw_lib.lBlosum50[0] == 5  # A vs A


def test_read_matrix_uses_its_parameter(tmp_path):
    p = tmp_path / "m.txt"
    p.write_text("# comment\n  A C G T\nA 2 -1 -1 -1\nC -1 2 -1 -1\n"
                 "G -1 -1 2 -1\nT -1 -1 -1 2\n")
    lEle, dEle2Int, dInt2Ele, lScore = ssw_lib.read_matrix(str(p))
    assert lEle == ["A", "C", "G", "T"]
    assert dEle2Int["a"] == 0 and dEle2Int["T"] == 3
    assert dInt2Ele[2] == "G"
    assert lScore == [2, -1, -1, -1, -1, 2, -1, -1,
                      -1, -1, 2, -1, -1, -1, -1, 2]


# ---------------------------------------------------------------------------
# Aligner Clear / ReBuild lifecycle (ref: src/ssw_cpp.cpp:359-420)
# ---------------------------------------------------------------------------

def test_rebuild_fails_unless_cleared():
    a = api.Aligner()
    assert a.rebuild() is False
    assert a.rebuild(1, 3, 5, 2) is False
    a.clear()
    assert a.rebuild() is True
    flag, al = a.align(READ, REF)
    assert al.sw_score == 21


def test_rebuild_with_scores_resets_everything():
    a = api.Aligner(match_score=9, mismatch_penalty=9,
                    gap_opening_penalty=9, gap_extending_penalty=9)
    a.clear()
    assert a.rebuild(1, 3, 5, 2) is True
    assert a.gap_open == 5 and a.gap_extend == 2
    flag, al = a.align(READ, REF)
    # same parameters as the reference CLI's -m1 -x3 -o5 -e2 set
    assert al.sw_score > 0


def test_rebuild_matrix_form_never_checks():
    """The custom-matrix ReBuild succeeds without a prior Clear —
    reference parity (src/ssw_cpp.cpp:394-407 has no empty check)."""
    a = api.Aligner()
    mat = dna_matrix(2, 2)
    assert a.rebuild(mat) is True
    flag, al = a.align(READ, REF)
    assert al.sw_score > 0


def test_cleared_aligner_is_disabled():
    a = api.Aligner()
    a.set_reference_sequence(REF)
    a.clear()
    assert a.set_reference_sequence(REF) == 0
    flag, al = a.align(READ, REF)
    assert flag == 0 and al.sw_score == 0 and al.cigar_string == ""


def test_align_without_reference_returns_false():
    a = api.Aligner()
    flag, al = a.align(READ)  # no stored reference
    assert flag == 0 and al.sw_score == 0


def test_empty_query_or_ref_returns_false():
    a = api.Aligner()
    flag, al = a.align("", REF)
    assert flag == 0 and al.sw_score == 0
    flag, al = a.align(READ, "")
    assert flag == 0 and al.sw_score == 0


def test_empty_stored_reference_disables_align():
    """SetReferenceSequence("") leaves translated_reference_ empty, and
    Align-vs-stored-ref then returns false (ref: src/ssw_cpp.cpp:277-279)."""
    a = api.Aligner()
    assert a.set_reference_sequence("") == 0
    flag, al = a.align(READ)
    assert flag == 0 and al.sw_score == 0
