"""pyssw twin CLI tests: regression goldens + field cross-checks against the
reference-binary-generated ssw_test goldens (same underlying alignments)."""

import io
import os
import re

import pytest

from ssw_tpu import pyssw

DATA = os.path.join(os.path.dirname(__file__), "data")
GOLD = os.path.join(os.path.dirname(__file__), "golden")


def run_pyssw(args):
    out, err = io.StringIO(), io.StringIO()
    rc = pyssw.main(args, out=out, err=err)
    assert rc == 0
    return out.getvalue(), err.getvalue()


def golden(name):
    with open(os.path.join(GOLD, name)) as f:
        return f.read()


@pytest.mark.parametrize("gold,args", [
    ("g_pyssw_r1_blast.txt", ["-c", "r1.fa", "r1_query.fq"]),
    ("g_pyssw_r1_sam.txt", ["-c", "-s", "-header", "r1.fa", "r1_query.fq"]),
    ("g_pyssw_prot_blast.txt", ["-c", "-p", "pRef.fa", "pRead.fa"]),
])
def test_pyssw_golden(gold, args):
    args = args[:-2] + [os.path.join(DATA, args[-2]),
                        os.path.join(DATA, args[-1])]
    out, _ = run_pyssw(args)
    assert out == golden(gold)


def test_pyssw_sam_fields_match_ssw_test():
    """POS / AS / ZS / FLAG / RNAME of pyssw SAM must agree with the
    reference binary's SAM on the same pair (CIGAR representation differs:
    pyssw has no soft clips)."""
    out, _ = run_pyssw(["-c", "-s", "-header",
                        os.path.join(DATA, "r1.fa"),
                        os.path.join(DATA, "r1_query.fq")])
    ours = [l for l in out.splitlines() if not l.startswith("@")]
    ref = [l for l in golden("g_r1_sam.txt").splitlines()
           if not l.startswith("@")]
    assert len(ours) == len(ref) == 1
    of, rf = ours[0].split("\t"), ref[0].split("\t")
    assert of[0] == rf[0]          # qname
    assert of[1].strip() == rf[1]  # flag
    assert of[2] == rf[2]          # rname
    assert of[3] == rf[3]          # pos
    o_tags = re.findall(r"(AS|ZS):i:(\d+)", ours[0])
    r_tags = re.findall(r"(AS|ZS):i:(\d+)", ref[0])
    assert o_tags == r_tags


def test_pyssw_blast_scores_match_ssw_test_protein():
    out, _ = run_pyssw(["-c", "-p", os.path.join(DATA, "pRef.fa"),
                        os.path.join(DATA, "pRead.fa")])
    nums = re.search(r"optimal_alignment_score: (\d+)\s+"
                     r"suboptimal_alignment_score: (\d+)", out)
    ref_nums = re.search(r"optimal_alignment_score: (\d+)\s+"
                         r"suboptimal_alignment_score: (\d+)",
                         golden("g_prot_blast.txt"))
    assert nums.groups() == ref_nums.groups()


def test_pyssw_rc_wins_ties_and_rejects_headerless():
    # headerless target2.fa is rejected by pyssw's reader (reference parity)
    with pytest.raises(SystemExit):
        list(pyssw.read(os.path.join(DATA, "target2.fa")))


def test_py2_softspace_semantics():
    buf = io.StringIO()
    p = pyssw.Py2Printer(buf)
    p.item("a\t")   # ends with tab -> no softspace
    p.item("b")     # no leading space; sets softspace
    p.item("c")     # leading space
    p.line("d\t")   # leading space, newline, reset
    p.line("e")     # no leading space
    assert buf.getvalue() == "a\tb c d\t\ne\n"
