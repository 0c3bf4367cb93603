"""Randomized byte-parity fuzzing against the reference binary.

Builds `ssw_test` from the read-only reference mount (skips when the mount
or toolchain is unavailable), generates random FASTA/FASTQ workloads across
penalty settings and output modes, and requires byte-identical stdout.
This extends the fixed golden suite with fresh inputs every run (seeded).
"""

import os
import random
import subprocess
import sys

import pytest

REF_SRC = "/root/reference/src"
DATA = os.path.join(os.path.dirname(__file__), "data")
BASES = "ACGT"


@pytest.fixture(scope="module")
def ref_binary(tmp_path_factory):
    if not os.path.isdir(REF_SRC):
        pytest.skip("reference mount unavailable")
    out = tmp_path_factory.mktemp("refbin") / "ssw_test"
    r = subprocess.run(
        ["gcc", "-O2", "-o", str(out),
         os.path.join(REF_SRC, "main.c"), os.path.join(REF_SRC, "ssw.c"),
         "-lm", "-lz"], capture_output=True)
    if r.returncode != 0:
        pytest.skip(f"cannot build reference binary: {r.stderr[:200]}")
    return str(out)


def _write_fasta(path, records):
    with open(path, "w") as f:
        for name, seq in records:
            f.write(f">{name}\n{seq}\n")


def _write_fastq(path, records):
    with open(path, "w") as f:
        for name, seq in records:
            f.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")


def _random_workload(rng, tmp, tag, ref_span=(80, 1200), n_span=(2, 8)):
    ref_len = rng.randrange(*ref_span)
    ref = "".join(rng.choice(BASES) for _ in range(ref_len))
    reads = []
    for i in range(rng.randrange(*n_span)):
        ln = rng.randrange(12, min(200, ref_len + 40))
        if rng.random() < 0.7:
            start = rng.randrange(0, max(1, ref_len - ln))
            r = list(ref[start:start + ln])
            for _ in range(rng.randrange(0, max(1, ln // 8))):
                p = rng.randrange(len(r))
                if rng.random() < 0.5:
                    r[p] = rng.choice(BASES)
                elif len(r) > 2:
                    del r[p]
            read = "".join(r)
        else:
            read = "".join(rng.choice(BASES) for _ in range(ln))
        if read:
            reads.append((f"r{tag}_{i}", read))
    t = os.path.join(tmp, f"t{tag}.fa")
    q = os.path.join(tmp, f"q{tag}.fq")
    _write_fasta(t, [(f"ref{tag}", ref)])
    _write_fastq(q, reads)
    return t, q


def _strip_volatile(stderr_text):
    """stderr lines minus the timing line, as a multiset (batching reorders
    warnings relative to the reference's strictly interleaved emission)."""
    return sorted(l for l in stderr_text.splitlines()
                  if l and not l.startswith("CPU time:"))


def _run_ours(args):
    import contextlib
    import io
    from ssw_tpu import cli
    out, err = io.StringIO(), io.StringIO()
    with contextlib.redirect_stderr(err):  # catches library-level warnings
        rc = cli.main(args, out=out, err=err)
    assert rc == 0
    return out.getvalue(), _strip_volatile(err.getvalue())


def _run_ref(binary, args):
    r = subprocess.run([binary] + args, capture_output=True, text=True,
                       timeout=300)
    assert r.returncode == 0, r.stderr[:300]
    return r.stdout, _strip_volatile(r.stderr)


OPTSETS = [
    ["-c"],
    ["-c", "-s", "-h"],
    ["-m", "1", "-x", "3", "-o", "5", "-e", "2", "-c"],
    ["-m", "3", "-x", "1", "-o", "2", "-e", "2", "-c", "-s", "-h"],
    ["-r", "-c", "-s", "-h"],
    ["-f", "30", "-c"],
    # gapO < gapE: bug-compatible oracle fallback path (striped lazy-F
    # simulation + exact scalar banded F recurrence)
    ["-m", "2", "-x", "2", "-o", "1", "-e", "3", "-c", "-s", "-h"],
]


# seed 121 triggers the banded tail fix-up overrun (flag=1 path).
# Default tier keeps one generic seed + the regression pin; the rest of
# the campaign is nightly (VERDICT r3 #8: the fuzz campaigns quintupled
# the suite wall).
@pytest.mark.parametrize("seed", [
    11, pytest.param(22, marks=pytest.mark.nightly),
    pytest.param(33, marks=pytest.mark.nightly), 121])
def test_fuzz_byte_parity(ref_binary, tmp_path, seed):
    rng = random.Random(seed)
    for k, opts in enumerate(OPTSETS):
        t, q = _random_workload(rng, str(tmp_path), f"{seed}_{k}")
        args = opts + [t, q]
        ours, ours_err = _run_ours(args)
        ref, ref_err = _run_ref(ref_binary, args)
        assert ours == ref, f"stdout mismatch for {args}"
        assert ours_err == ref_err, f"stderr mismatch for {args}"


# seeds chosen arbitrarily; each runs 4 optsets x (streaming + packing).
# Interpret-mode DP over 2.5-6k-column targets: minutes per seed ->
# nightly; the kernel-level packed/streaming parity lives in
# test_pack.py / test_stream_subopt.py on the default tier.
@pytest.mark.nightly
@pytest.mark.parametrize("seed", [7, 42])
def test_fuzz_streaming_packed_byte_parity(ref_binary, tmp_path, seed,
                                           monkeypatch):
    """Forced streaming + pinned lane packing: fuzzes the blockmax
    (encoded lanetrack) kernel, the bounded-window suboptimal re-runs,
    and the packed forward path against the reference binary at the CLI
    byte level — the base fuzz workloads are too small to ever take these
    paths (streaming needs ~32k columns, packing needs full batches)."""
    from ssw_tpu import pipeline

    # CPU runs the scan backend by default; force the pallas (interpret)
    # backend so the CLI really routes through the blockmax/packed kernel
    monkeypatch.setattr(pipeline, "pick_backend", lambda b: "pallas")
    monkeypatch.setenv("SSW_TPU_STREAM_SUBOPT", "1")
    monkeypatch.setattr(pipeline, "PACK_L", 512)
    rng = random.Random(seed)
    for k, opts in enumerate((["-c"],
                              ["-c", "-s", "-h"],
                              ["-r", "-c", "-s", "-h"],
                              ["-m", "1", "-x", "3", "-o", "5", "-e", "2",
                               "-c"])):
        t, q = _random_workload(rng, str(tmp_path), f"sp{seed}_{k}",
                                ref_span=(2500, 6000), n_span=(10, 24))
        args = opts + [t, q]
        ours, ours_err = _run_ours(args)
        ref, ref_err = _run_ref(ref_binary, args)
        assert ours == ref, f"stdout mismatch for {args}"
        assert ours_err == ref_err, f"stderr mismatch for {args}"


AA = "ARNDCQEGHILKMFPSTWYV"


@pytest.mark.parametrize("seed", [5, pytest.param(
    17, marks=pytest.mark.nightly)])
def test_fuzz_protein_byte_parity(ref_binary, tmp_path, seed):
    """Protein mode (-p, BLOSUM50 default): exercises the quirk path (the
    lane-block E restriction is observable for min(mat) < -2*gapE)."""
    rng = random.Random(seed)
    for k, opts in enumerate((["-p", "-c"],
                              ["-p", "-c", "-s", "-h"],
                              ["-p", "-o", "10", "-e", "1", "-c"])):
        ref_len = rng.randrange(60, 400)
        ref = "".join(rng.choice(AA) for _ in range(ref_len))
        reads = []
        for i in range(rng.randrange(2, 5)):
            ln = rng.randrange(10, 120)
            if rng.random() < 0.7 and ref_len > ln:
                start = rng.randrange(0, ref_len - ln)
                r = list(ref[start:start + ln])
                for _ in range(rng.randrange(0, max(1, ln // 6))):
                    r[rng.randrange(len(r))] = rng.choice(AA)
                reads.append((f"p{seed}_{i}", "".join(r)))
            else:
                reads.append((f"p{seed}_{i}",
                              "".join(rng.choice(AA) for _ in range(ln))))
        t = os.path.join(str(tmp_path), f"pt{seed}_{k}.fa")
        q = os.path.join(str(tmp_path), f"pq{seed}_{k}.fq")
        _write_fasta(t, [(f"pref{seed}", ref)])
        _write_fastq(q, reads)
        args = opts + [t, q]
        ours, ours_err = _run_ours(args)
        ref_out, ref_err = _run_ref(ref_binary, args)
        assert ours == ref_out, f"stdout mismatch for {args}"
        assert ours_err == ref_err, f"stderr mismatch for {args}"


def _protein_workload(rng, tmp, tag, tname, qname):
    ref_len = rng.randrange(60, 300)
    ref = "".join(rng.choice(AA) for _ in range(ref_len))
    reads = []
    for i in range(rng.randrange(2, 5)):
        ln = rng.randrange(10, 90)
        if rng.random() < 0.7 and ref_len > ln:
            start = rng.randrange(0, ref_len - ln)
            r = list(ref[start:start + ln])
            for _ in range(rng.randrange(0, max(1, ln // 6))):
                r[rng.randrange(len(r))] = rng.choice(AA)
            reads.append((f"m{tag}_{i}", "".join(r)))
        else:
            reads.append((f"m{tag}_{i}",
                          "".join(rng.choice(AA) for _ in range(ln))))
    t = os.path.join(tmp, tname)
    q = os.path.join(tmp, qname)
    _write_fasta(t, [(f"mref{tag}", ref)])
    _write_fastq(q, reads)
    return t, q


@pytest.mark.parametrize("seed", [3, pytest.param(
    41, marks=pytest.mark.nightly)])
def test_matrix_file_byte_parity(ref_binary, tmp_path, monkeypatch, seed):
    """-a matrix-file runs against the reference binary (VERDICT round-1
    item 3).  Runs from a controlled cwd with uppercase file names so the
    reference's argv value-leak scans only inert characters; the
    `blosum62.txt` case exercises the leak itself (its 's' toggles SAM —
    see parse_args)."""
    import shutil
    shutil.copy(os.path.join(DATA, "blosum62.txt"), tmp_path / "B62.TXT")
    shutil.copy(os.path.join(DATA, "blosum62.txt"),
                tmp_path / "blosum62.txt")
    rng = random.Random(seed)
    _protein_workload(rng, str(tmp_path), seed, "T.FA", "Q.FQ")
    monkeypatch.chdir(tmp_path)
    for opts in (["-p", "-a", "B62.TXT", "-c"],          # documented run
                 ["-p", "-a", "blosum62.txt", "-c"],     # leaked -s quirk
                 ["-p", "-a", "B62.TXT", "-c", "-s", "-h"],
                 ["-p", "-a", "B62.TXT", "-o", "11", "-e", "1", "-c"]):
        args = opts + ["T.FA", "Q.FQ"]
        ours, ours_err = _run_ours(args)
        ref_out, ref_err = _run_ref(ref_binary, args)
        assert ours == ref_out, f"stdout mismatch for {args}"
        assert ours_err == ref_err, f"stderr mismatch for {args}"


def test_argv_scanner_quirk_parity(ref_binary, tmp_path, monkeypatch):
    """The reference's argv refactor keeps scanning inside (and past) a
    consumed option value (ref: src/main.c:257-304 — the inner loop indexes
    the post-increment argv[i]).  parse_args models the packed argv buffer;
    these cases pin the observable quirks against the real binary."""
    rng = random.Random(99)
    _write_fasta(tmp_path / "T.FA",
                 [("tq", "".join(rng.choice(BASES) for _ in range(300)))])
    _write_fastq(tmp_path / "Q.FQ",
                 [("rq", "".join(rng.choice(BASES) for _ in range(60)))])
    monkeypatch.chdir(tmp_path)
    for args in (
        # value followed directly by files: the scan walks past "3\0" into
        # "T.FA"'s (inert, uppercase) bytes
        ["-m", "3", "T.FA", "Q.FQ"],
        ["-x", "3", "-o", "10", "T.FA", "Q.FQ"],
        # attached -m1 does NOT set match; it consumes T.FA as the value
        # and the file walk then mis-locates the files -> usage error
        ["-m1", "T.FA", "Q.FQ"],
        # -m -3: value starts with '-', never consumed (negatives
        # impossible), and "-3" itself scans as a no-op flag group
        ["-m", "-3", "-c", "T.FA", "Q.FQ"],
    ):
        import contextlib
        import io
        from ssw_tpu import cli
        out, err = io.StringIO(), io.StringIO()
        with contextlib.redirect_stderr(err):
            rc = cli.main(args, out=out, err=err)
        r = subprocess.run([ref_binary] + args, capture_output=True,
                           text=True, timeout=300, env={})
        assert rc == r.returncode, f"rc mismatch for {args}"
        assert out.getvalue() == r.stdout, f"stdout mismatch for {args}"
        ours_err = _strip_volatile(err.getvalue())
        ref_err = _strip_volatile(r.stderr)
        assert ours_err == ref_err, f"stderr mismatch for {args}"
