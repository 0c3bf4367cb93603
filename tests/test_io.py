"""FASTA/FASTQ reader semantics: python and native readers must agree with
each other and with kseq behavior on every fixture incl. the malformed
probe (test.seq) and gzip input."""

import glob
import os

import pytest

from ssw_tpu.io import fastx
from ssw_tpu.io.writers import mapq

DATA = os.path.join(os.path.dirname(__file__), "data")
FILES = sorted(glob.glob(os.path.join(DATA, "*.fa")) +
               glob.glob(os.path.join(DATA, "*.fastq")) +
               glob.glob(os.path.join(DATA, "*.fq")) +
               glob.glob(os.path.join(DATA, "*.seq")) +
               glob.glob(os.path.join(DATA, "*.gz")))


@pytest.mark.parametrize("path", FILES, ids=os.path.basename)
def test_python_native_agree(path):
    py = list(fastx.read_fastx(path))
    try:
        nat = list(fastx.read_fastx_native(path))
    except ImportError:
        pytest.skip("native lib unavailable")
    assert len(py) == len(nat)
    for a, b in zip(py, nat):
        assert (a.name, a.comment, a.seq, a.qual) == \
            (b.name, b.comment, b.seq, b.qual)


def test_headerless_skipped():
    recs = fastx.read_fastx_all(os.path.join(DATA, "target2.fa"))
    assert recs == []


def test_gzip_reads():
    recs = fastx.read_fastx_all(os.path.join(DATA, "Virus_genome.fa.gz"))
    assert len(recs) >= 1
    assert len(recs[0].seq) > 1000


def test_fastq_quality_lengths():
    recs = fastx.read_fastx_all(
        os.path.join(DATA, "54mer_hap1_1.100.fastq"))
    assert len(recs) == 100
    for r in recs:
        assert r.qual is not None and len(r.qual) == len(r.seq)


def test_mapq_semantics():
    # score2 == 0 -> inf -> C uint32 cast -> 0 -> +4.99 -> 4
    assert mapq(12, 0) == 4
    # score2 == score1 -> log(1) = 0 -> 4
    assert mapq(50, 50) == 4
    # the double is truncated BEFORE adding 4.99
    assert mapq(48, 45) == 4   # -4.343*ln(0.9375)=0.28 -> 0 -> 4


def test_mapq_large():
    import math
    m0 = int(-4.343 * math.log(1 - 99 / 100))
    assert mapq(100, 1) == min(m0 + 4, 254)
