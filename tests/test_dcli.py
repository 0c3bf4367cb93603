"""Distributed CLI end-to-end: N independent host runs + merge must be
byte-identical to the single-process ssw_tpu.cli output (which itself is
byte-identical to the reference binary per test_cli_golden)."""

import io
import os

from ssw_tpu import cli, dcli

DATA = os.path.join(os.path.dirname(__file__), "data")


def _single(args):
    out, err = io.StringIO(), io.StringIO()
    assert cli.main(args, out=out, err=err) == 0
    return out.getvalue()


def _dcli(args):
    out, err = io.StringIO(), io.StringIO()
    assert dcli.main(args, out=out, err=err) == 0
    return err.getvalue()


def test_two_host_sam_matches_single(tmp_path):
    target = os.path.join(DATA, "10k.fa")
    query = os.path.join(DATA, "54mer_hap1_1.100.fastq")
    want = _single(["-c", "-s", "-h", "-r", target, query])

    prefix = str(tmp_path / "run")
    for host in range(2):
        _dcli(["align", "-c", "-s", "--header", "-r",
               "--num-hosts", "2", "--host-id", str(host),
               "--batch-size", "32", "--out", prefix,
               "--journal", prefix, target, query])
    merged = str(tmp_path / "merged.sam")
    _dcli(["merge", "--out", merged,
           f"{prefix}.part0", f"{prefix}.part1"])
    with open(merged) as f:
        assert f.read() == want


def test_mesh_sharded_host_matches_single(tmp_path):
    """Config-5 proxy: a host with >1 local device routes the forward pass
    through the (data x seq) mesh (align_batch_sharded with target sharding
    + halo); output must stay byte-identical to the single-device CLI."""
    import jax
    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs 8 virtual devices")
    target = os.path.join(DATA, "1k.fa")
    query = os.path.join(DATA, "54mer_hap1_1.100.fastq")
    want = _single(["-c", "-s", "-h", target, query])
    prefix = str(tmp_path / "m")
    _dcli(["align", "-c", "-s", "--header", "--num-hosts", "1",
           "--host-id", "0", "--batch-size", "64", "--mesh-seq", "2",
           "--out", prefix, target, query])
    merged = str(tmp_path / "out.sam")
    _dcli(["merge", "--out", merged, f"{prefix}.part0"])
    with open(merged) as f:
        assert f.read() == want


def test_resume_after_partial_run(tmp_path):
    target = os.path.join(DATA, "1k.fa")
    query = os.path.join(DATA, "54mer_hap1_1.100.fastq")
    want = _single(["-c", target, query])

    prefix = str(tmp_path / "r")
    # first run completes fully and writes the journal
    _dcli(["align", "-c", "--num-hosts", "1", "--host-id", "0",
           "--batch-size", "40", "--out", prefix, "--journal", prefix,
           target, query])
    # a re-run with the journal present must do nothing and keep the shard
    before = open(f"{prefix}.part0").read()
    msg = _dcli(["align", "-c", "--num-hosts", "1", "--host-id", "0",
                 "--batch-size", "40", "--out", prefix, "--journal", prefix,
                 target, query])
    assert "0 reads" in msg
    assert open(f"{prefix}.part0").read() == before
    merged = str(tmp_path / "m.txt")
    _dcli(["merge", "--out", merged, f"{prefix}.part0"])
    assert open(merged).read() == want
