"""Real two-process jax.distributed run (VERDICT round-1 item 7b): two
`dcli align --coordinator ...` subprocesses go through
multihost.init_distributed (coordinator handshake + global device view),
and their merged shards must be byte-identical to the single-process CLI.
Runs on the CPU backend; exercises the code path the test suite otherwise
only simulates in-process."""

import io
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


RUNNER = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
from ssw_tpu import dcli
rc = dcli.main({args!r})
assert jax.process_count() == 2, jax.process_count()
sys.exit(rc)
"""


def test_two_process_distributed_align(tmp_path):
    target = os.path.join(REPO, "tests", "data", "1k.fa")
    query = os.path.join(REPO, "tests", "data", "54mer_hap1_1.100.fastq")
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    prefix = str(tmp_path / "out")

    procs = []
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("PYTHONPATH",))}
    for host in (0, 1):
        args = ["align", "-c", "-s", "--header",
                "--coordinator", coord, "--num-hosts", "2",
                "--host-id", str(host), "--batch-size", "32",
                "--out", prefix, target, query]
        code = RUNNER.format(repo=REPO, args=args)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", code], cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=900)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, out, err in outs:
        assert rc == 0, err[-800:]

    # merge and compare to the single-process CLI byte-for-byte
    from ssw_tpu import cli, dcli
    merged = str(tmp_path / "merged.sam")
    assert dcli.main(["merge", "--out", merged,
                      f"{prefix}.part0", f"{prefix}.part1"],
                     err=io.StringIO()) == 0
    want_out, want_err = io.StringIO(), io.StringIO()
    assert cli.main(["-c", "-s", "-h", target, query],
                    out=want_out, err=want_err) == 0
    assert open(merged).read() == want_out.getvalue()
