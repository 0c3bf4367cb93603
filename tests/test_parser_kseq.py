"""Character-level kseq parser semantics (old kseq, ref: src/kseq.h:170-208):
whitespace inside sequence data dropped (isgraph filter), mid-line
'>'/'+'/'@' terminate records, NCBI-style numbered/space-grouped FASTA,
quality counted over bytes 33..127, truncated quality ends the stream."""

import os
import subprocess

import pytest

from ssw_tpu.io import fastx

REF_SRC = "/root/reference/src"


def recs(path):
    return [(r.name, r.comment, r.seq, r.qual)
            for r in fastx.read_fastx(path)]


def write(tmp_path, text, name="f.fa"):
    p = tmp_path / name
    p.write_bytes(text.encode())
    return str(p)


def test_spaces_and_digits_kept_out_of_sequence(tmp_path):
    # NCBI-flavored FASTA: digits/spaces — digits are isgraph (kept),
    # spaces dropped
    p = write(tmp_path, ">r1 desc\nACGT ACGT\nAC GT\n")
    (name, comment, seq, qual), = recs(p)
    assert (name, comment, qual) == ("r1", "desc", None)
    assert seq == "ACGTACGTACGT"


def test_midline_terminator_splits_records(tmp_path):
    p = write(tmp_path, ">a\nACGT>b\nGGTT\n")
    out = recs(p)
    assert [(r[0], r[2]) for r in out] == [("a", "ACGT"), ("b", "GGTT")]


def test_quality_counts_33_to_127_and_consumes_one_extra(tmp_path):
    # quality line contains a space (not counted) and is split across lines
    p = write(tmp_path, "@q\nACGTA\n+\nII I\nII\n@q2\nGG\n+\nII\n",
              name="f.fq")
    out = recs(p)
    assert out[0][2] == "ACGTA" and out[0][3] == "IIIII"
    assert out[1][0] == "q2" and out[1][3] == "II"


def test_truncated_quality_stops_stream(tmp_path):
    p = write(tmp_path, "@q\nACGT\n+\nII", name="f.fq")
    assert recs(p) == []


def test_empty_sequence_fastq_consumes_one_byte(tmp_path):
    # kseq's quality loop reads exactly one byte even for an empty
    # sequence, eating the next record's '@'; the scan then runs to EOF
    # without finding another header
    p = write(tmp_path, "@a\n+\n@b\nACGT\n+\nIIII\n", name="f.fq")
    out = recs(p)
    assert len(out) == 1
    assert out[0][0] == "a" and out[0][2] == "" and out[0][3] == ""


def test_headerless_prefix_skipped_to_first_marker(tmp_path):
    p = write(tmp_path, "garbage no marker\nstill none\n>x\nAC\n")
    out = recs(p)
    assert [(r[0], r[2]) for r in out] == [("x", "AC")]


def test_native_matches_python_on_nasty_input(tmp_path):
    from ssw_tpu.native import build as native_build
    if native_build.load() is None:
        pytest.skip("native unavailable")
    text = (">a desc\n   1 ACGTACGTAG GGTTCCAA\nACGT>b\nCCGG\r\nTT AA\n"
            "@c\nACGT\n+\nI I II\n@d\nGG\n+\nII\n")
    p = write(tmp_path, text)
    py = list(fastx.read_fastx(p))
    nat = list(fastx.read_fastx_native(p))
    assert [(r.name, r.seq, r.qual) for r in py] == \
           [(r.name, r.seq, r.qual) for r in nat]


def test_cli_parity_on_ncbi_style_fasta(tmp_path):
    """End-to-end: NCBI-style spaced/numbered target through both our CLI
    and the reference binary must emit identical bytes."""
    if not os.path.isdir(REF_SRC):
        pytest.skip("reference mount unavailable")
    binary = tmp_path / "ssw_test"
    if subprocess.run(["gcc", "-O2", "-o", str(binary),
                       os.path.join(REF_SRC, "main.c"),
                       os.path.join(REF_SRC, "ssw.c"), "-lm", "-lz"],
                      capture_output=True).returncode != 0:
        pytest.skip("cannot build reference binary")
    seq = ("ACGTACGTAGGGTTCCAACCGGTTAAGGCTCTAGGATTACCAGGCATAACGTTACGGTAC"
           "GATCGATCGAGGCTTAAACCGGTTACAGTACCAGGTTAACCGGATCCTTAAGGCCTTAA")
    body = "\n".join(f"{i+1:>9} " + " ".join(
        seq[i + k:i + k + 10] for k in range(0, 60, 10))
        for i in range(0, len(seq), 60))
    t = write(tmp_path, f">chrN test\n{body}\n", name="t.fa")
    q = write(tmp_path, f"@r0\n{seq[10:90]}\n+\n{'I'*80}\n", name="q.fq")
    args = ["-c", "-s", "-h", t, q]
    import contextlib
    import io
    from ssw_tpu import cli
    out = io.StringIO()
    with contextlib.redirect_stderr(io.StringIO()):
        assert cli.main(args, out=out, err=io.StringIO()) == 0
    ref = subprocess.run([str(binary)] + args, capture_output=True,
                         text=True, timeout=120)
    assert out.getvalue() == ref.stdout


def test_crlf_comment_keeps_carriage_return(tmp_path):
    """Old kseq's ks_getuntil(ks, '\\n', &comment) stops at the literal
    '\\n' and does NOT strip '\\r' — CRLF input leaves the CR in the
    comment (ref: src/kseq.h:108,180; ADVICE round 1)."""
    p = write(tmp_path, ">r1 desc here\r\nACGT\r\n")
    (name, comment, seq, qual), = recs(p)
    assert name == "r1"
    assert comment == "desc here\r"
    assert seq == "ACGT"
