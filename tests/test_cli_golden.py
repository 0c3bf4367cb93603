"""End-to-end CLI byte-parity against golden outputs captured from the
reference `ssw_test` binary (see tests/golden/README for regeneration)."""

import io
import os

import pytest

from ssw_tpu import cli

HERE = os.path.dirname(__file__)
DATA = os.path.join(HERE, "data")
GOLD = os.path.join(HERE, "golden")


def run_cli(args):
    out = io.StringIO()
    err = io.StringIO()
    rc = cli.main(args, out=out, err=err)
    return rc, out.getvalue(), err.getvalue()


CASES = [
    (["-c", "-p", "pRef.fa", "pRead.fa"], "g_prot_blast.txt"),
    (["-c", "target.fastq", "query.fastq"], "g_fq_blast.txt"),
    (["-c", "-s", "-h", "r1.fa", "r1_query.fq"], "g_r1_sam.txt"),
    (["-c", "-s", "-h", "-r", "10k.fa", "54mer_hap1_1.100.fa"],
     "g_54fa_10k_sam.txt"),
    (["-c", "-r", "1k.fa", "54mer_hap1_1.100.fastq"], "g_54_1k_blast.txt"),
    (["-m", "1", "-x", "3", "-o", "5", "-e", "2", "-c", "-s", "-h", "10k.fa",
      "54mer_hap1_1.100.fastq"], "g_54_10k_m1x3o5e2.txt"),
]

SLOW_CASES = [
    (["-c", "-s", "-h", "-r", "100k.fa", "54mer_hap1_1.100.fastq"],
     "g_54mer_100k_sam.txt"),
]


def _paths(args):
    return [os.path.join(DATA, a) if a.endswith((".fa", ".fastq", ".fq",
                                                 ".txt", ".seq", ".gz"))
            and not a.lstrip("-").isdigit() else a for a in args]


@pytest.mark.parametrize("args,gold", CASES)
def test_cli_golden(args, gold):
    rc, out, _ = run_cli(_paths(args))
    assert rc == 0
    with open(os.path.join(GOLD, gold)) as f:
        assert out == f.read()


@pytest.mark.slow
@pytest.mark.parametrize("args,gold", SLOW_CASES)
def test_cli_golden_slow(args, gold):
    rc, out, _ = run_cli(_paths(args))
    assert rc == 0
    with open(os.path.join(GOLD, gold)) as f:
        assert out == f.read()


def test_headerless_target_yields_no_records():
    """demo/target2.fa has no FASTA header; kseq finds no records and the
    reference emits nothing (ref: src/kseq.h:175-179)."""
    rc, out, _ = run_cli(_paths(["-c", "target2.fa", "query2.fa"]))
    assert rc == 0
    assert out == ""


def test_malformed_testseq_golden():
    """demo/test.seq mixes '>' and '@' records; kseq parses them anyway."""
    rc, out, _ = run_cli([os.path.join(DATA, "1k.fa"),
                          os.path.join(DATA, "test.seq"), "-c"])
    assert rc == 0
    with open(os.path.join(GOLD, "g_testseq_blast.txt")) as f:
        assert out == f.read()


def test_cli_golden_matrix_file_config2(tmp_path, monkeypatch):
    """BASELINE config 2: protein alignment with a BLOSUM62 matrix FILE
    (-p -a -c), byte-equal to the committed reference-binary capture.

    Runs from a controlled cwd with uppercase file names: the reference's
    argv scanner keeps reading flag characters out of the consumed -a
    value (see cli.parse_args), and lowercase path letters would toggle
    -r/-s; the golden was captured with exactly this argv."""
    import shutil
    shutil.copy(os.path.join(DATA, "blosum62.txt"), tmp_path / "B62.TXT")
    shutil.copy(os.path.join(DATA, "protein1.fa"),
                tmp_path / "PROTEIN1.FA")
    shutil.copy(os.path.join(DATA, "protein2.fa"),
                tmp_path / "PROTEIN2.FA")
    monkeypatch.chdir(tmp_path)
    rc, out, _ = run_cli(["-p", "-a", "B62.TXT", "-c",
                          "PROTEIN2.FA", "PROTEIN1.FA"])
    assert rc == 0
    with open(os.path.join(GOLD, "g_prot_b62_blast.txt")) as f:
        assert out == f.read()
