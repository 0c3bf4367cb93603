"""Bounded-memory many-target streaming: when the target file exceeds one
chunk, the CLI re-streams it per read batch (cli.stream_render_batch) —
stdout must stay byte-identical to the in-memory path and to the reference
binary (which re-reads the target file per read, ref: src/main.c:493-531),
and stderr must carry the same warning multiset."""

import io
import os
import random
import subprocess

import pytest

from ssw_tpu import cli

REF_SRC = "/root/reference/src"
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


def _workload(tmp_path, n_targets=24, n_reads=12, seed=5):
    rng = random.Random(seed)
    tpath = os.path.join(tmp_path, "db.fa")
    qpath = os.path.join(tmp_path, "q.fq")
    targets = []
    with open(tpath, "w") as f:
        for i in range(n_targets):
            seq = "".join(rng.choice(BASES)
                          for _ in range(rng.randrange(60, 400)))
            targets.append(seq)
            f.write(f">db{i}\n{seq}\n")
    with open(qpath, "w") as f:
        for i in range(n_reads):
            if rng.random() < 0.7:
                src = rng.choice(targets)
                ln = rng.randrange(20, min(120, len(src)))
                st = rng.randrange(0, len(src) - ln + 1)
                seq = list(src[st:st + ln])
                for _ in range(rng.randrange(0, ln // 10 + 1)):
                    seq[rng.randrange(len(seq))] = rng.choice(BASES)
                seq = "".join(seq)
            else:
                seq = "".join(rng.choice(BASES)
                              for _ in range(rng.randrange(20, 120)))
            f.write(f"@r{i}\n{seq}\n+\n{'I' * len(seq)}\n")
    return tpath, qpath


def _run_cli(args):
    out, err = io.StringIO(), io.StringIO()
    rc = cli.main(args, out=out, err=err)
    assert rc == 0
    return out.getvalue(), err.getvalue()


def _warn_multiset(stderr_text):
    return sorted(l for l in stderr_text.splitlines()
                  if l and not l.startswith("CPU time:"))


@pytest.mark.parametrize("extra", [["-c"], ["-c", "-r"],
                                   ["-c", "-s", "-h", "-r"]])
def test_streaming_matches_inmemory(tmp_path, monkeypatch, extra):
    tpath, qpath = _workload(str(tmp_path))
    args = extra + [tpath, qpath]
    base_out, base_err = _run_cli(args)
    # force the streaming path with several small chunks
    monkeypatch.setattr(cli, "TARGET_CHUNK_COUNT", 5)
    stream_out, stream_err = _run_cli(args)
    assert stream_out == base_out
    assert _warn_multiset(stream_err) == _warn_multiset(base_err)


def test_streaming_matches_reference(tmp_path, monkeypatch, ref_binary):
    tpath, qpath = _workload(str(tmp_path), n_targets=31, n_reads=9, seed=9)
    ref = subprocess.run([ref_binary, "-c", tpath, qpath],
                         capture_output=True, text=True)
    monkeypatch.setattr(cli, "TARGET_CHUNK_COUNT", 4)
    stream_out, stream_err = _run_cli(["-c", tpath, qpath])
    assert stream_out == ref.stdout
    assert _warn_multiset(stream_err) == _warn_multiset(ref.stderr)


def test_streaming_batch_boundary(tmp_path, monkeypatch):
    """Reads crossing the read-batch boundary must render identically
    (each batch re-streams the target file from the top)."""
    tpath, qpath = _workload(str(tmp_path), n_targets=13, n_reads=7, seed=3)
    base_out, base_err = _run_cli(["-c", "-r", tpath, qpath])
    monkeypatch.setattr(cli, "TARGET_CHUNK_COUNT", 3)
    monkeypatch.setattr(cli, "BATCH_SIZE", 2)
    stream_out, stream_err = _run_cli(["-c", "-r", tpath, qpath])
    assert stream_out == base_out
    assert _warn_multiset(stream_err) == _warn_multiset(base_err)
