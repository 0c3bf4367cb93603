"""Deterministic synthesizer for the demo blobs absent from the reference
mount (/root/reference/.MISSING_LARGE_BLOBS):

  * 10M.fa               — 10 Mbp genome slice (extends demo/1M.fa with a
                           composition-matched synthetic continuation)
  * 100k_illumina1.fastq.gz — 100k Illumina-like 100bp reads sampled from
                           the 1M slice with a ~0.5% substitution error model
  * ref.fa               — alias genome for the multi-host sharding config
                           (the 10M slice under the name the configs use)

These feed BASELINE.json configs 4-5 (data-parallel SAM run on 1M.fa;
reference-sharded run on 10M.fa).  Everything is seeded, so the files are
reproducible byte-for-byte.

Usage: python tools/make_data.py [outdir]   (default: bench_data/)
"""

from __future__ import annotations

import gzip
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
ONE_M = os.path.join(REPO, "tests", "data", "1M.fa")

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def load_fasta_seq(path: str) -> bytes:
    seq = []
    with open(path, "rb") as f:
        for line in f:
            if line.startswith(b">"):
                continue
            seq.append(line.strip())
    return b"".join(seq)


def write_fasta(path: str, name: str, seq: bytes, width: int = 10000):
    with open(path, "wb") as f:
        f.write(b">" + name.encode() + b"\n")
        for i in range(0, len(seq), width):
            f.write(seq[i:i + width] + b"\n")


def make_10m(out: str, base: bytes) -> bytes:
    """Extend the real 1M slice to 10M with a 5th-order-free synthetic tail
    matching the slice's base composition (N-free)."""
    rng = np.random.default_rng(10_000_000)
    arr = np.frombuffer(base, dtype=np.uint8)
    acgt = arr[np.isin(arr, BASES)]
    counts = np.array([(acgt == b).sum() for b in BASES], dtype=np.float64)
    p = counts / counts.sum()
    tail_len = 10_000_000 - len(base)
    tail = rng.choice(BASES, size=tail_len, p=p).astype(np.uint8)
    seq = base + tail.tobytes()
    write_fasta(out, "chr3\t50000\t10050000\tsynthetic-extension", seq)
    return seq


def make_reads(out: str, genome: bytes, n_reads: int = 100_000,
               read_len: int = 100, err: float = 0.005, rc_frac: float = 0.5):
    """Illumina-like FASTQ: uniform positions, substitution errors, Q-ramp
    quality strings, half the reads reverse-complemented."""
    rng = np.random.default_rng(100_000)
    g = np.frombuffer(genome, dtype=np.uint8)
    # avoid N runs: restrict sampling to positions whose window is N-free
    is_acgt = np.isin(g, BASES)
    ok = np.ones(len(g) - read_len + 1, dtype=bool)
    run = np.cumsum(is_acgt.astype(np.int64))
    window_acgt = run[read_len - 1:] - np.concatenate(([0], run[:-read_len]))
    ok = window_acgt == read_len
    positions = np.nonzero(ok)[0]
    comp = np.zeros(256, dtype=np.uint8)
    for a, b in zip(b"ACGT", b"TGCA"):
        comp[a] = b
    qual_hi = np.full(read_len, ord("I"), dtype=np.uint8)
    qual_hi[-read_len // 5:] = ord("?")  # 3' quality drop-off
    qual_line = qual_hi.tobytes()
    with gzip.open(out, "wb", compresslevel=6) as f:
        pos = rng.choice(positions, size=n_reads)
        do_rc = rng.random(n_reads) < rc_frac
        for i in range(n_reads):
            rd = g[pos[i]:pos[i] + read_len].copy()
            m = rng.random(read_len) < err
            if m.any():
                rd[m] = rng.choice(BASES, size=int(m.sum()))
            if do_rc[i]:
                rd = comp[rd][::-1]
            f.write(b"@sim_%d_%d_%s\n" % (i, pos[i],
                                          b"r" if do_rc[i] else b"f"))
            f.write(rd.tobytes() + b"\n+\n" + qual_line + b"\n")


def make_iontorrent(out_ref: str, out_fq: str):
    """The reference README's headline workload (README.md:66-71): 1000 Ion
    Torrent reads, 25-540bp (most ~200bp), vs a 4,938,920bp genome."""
    rng = np.random.default_rng(4_938_920)
    genome = rng.choice(BASES, 4_938_920).astype(np.uint8)
    write_fasta(out_ref, "ecoli_synth\t4938920bp", genome.tobytes())
    with open(out_fq, "wb") as f:
        for i in range(1000):
            ln = int(np.clip(rng.normal(200, 80), 25, 540))
            pos = int(rng.integers(0, len(genome) - ln))
            rd = genome[pos:pos + ln].copy()
            m = rng.random(ln) < 0.01
            if m.any():
                rd[m] = rng.choice(BASES, int(m.sum()))
            f.write(b"@ion_%d_%d\n" % (i, pos))
            f.write(rd.tobytes() + b"\n+\n" + b"I" * ln + b"\n")


def main(outdir: str):
    os.makedirs(outdir, exist_ok=True)
    base = load_fasta_seq(ONE_M)
    ten_m_path = os.path.join(outdir, "10M.fa")
    fq_path = os.path.join(outdir, "100k_illumina1.fastq.gz")
    ref_path = os.path.join(outdir, "ref.fa")
    ion_ref = os.path.join(outdir, "ecoli_synth.fa")
    ion_fq = os.path.join(outdir, "iontorrent_1k.fastq")
    if not (os.path.exists(ion_ref) and os.path.exists(ion_fq)):
        make_iontorrent(ion_ref, ion_fq)
    if not os.path.exists(ten_m_path):
        seq = make_10m(ten_m_path, base)
    else:
        seq = load_fasta_seq(ten_m_path)
    if not os.path.exists(fq_path):
        make_reads(fq_path, base)
    if not os.path.exists(ref_path):
        write_fasta(ref_path, "ref\tsynthetic 10M", seq)
    print(f"wrote {outdir}: 10M.fa ({len(seq)} bp), "
          f"100k_illumina1.fastq.gz, ref.fa")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO,
                                                            "bench_data"))
