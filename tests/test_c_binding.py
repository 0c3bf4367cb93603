"""Compile and run the C client binding end-to-end against the bridge
worker (VERDICT round-2 missing item 1: the reference's primary artifact is
a C-callable libssw.so — ref: src/ssw.h:86-140, src/example.c:105-156).

The C client is a thin synchronous speaker of the JSON-lines bridge
protocol; this test gcc-compiles ssw_client.c + example_c.c, runs the
example (which spawns `python -m ssw_tpu.bridge` with the CPU platform
forced via SSW_TPU_BRIDGE_PLATFORM), and asserts the reference example's
known result values."""

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
C_SRC = os.path.join(REPO, "bindings", "c")


@pytest.mark.skipif(not shutil.which("gcc"), reason="no gcc on this image")
def test_c_example_runs_against_bridge(tmp_path):
    exe = str(tmp_path / "example_c")
    subprocess.run(
        ["gcc", "-O2", "-Wall", "-o", exe,
         os.path.join(C_SRC, "example_c.c"),
         os.path.join(C_SRC, "ssw_client.c")],
        check=True, capture_output=True, timeout=120)
    env = dict(os.environ, SSW_TPU_BRIDGE_PLATFORM="cpu")
    env.pop("PYTHONPATH", None)  # breaks the axon plugin registration
    r = subprocess.run([exe, REPO, sys.executable], capture_output=True,
                       text=True, timeout=600, env=env)
    assert r.returncode == 0, r.stderr[-800:]
    # ref: src/example.c golden values (1-based like ssw_write's output)
    assert "optimal_alignment_score: 21" in r.stdout
    assert "sub-optimal_alignment_score: 8" in r.stdout
    assert "target_begin: 9" in r.stdout and "target_end: 22" in r.stdout
    assert "query_begin: 1" in r.stdout and "query_end: 15" in r.stdout
    # the C-level cigar is M-based (banded_sw emits M/I/D; the =/X split
    # is the C++ wrapper's mark_mismatch layer) — ref: src/ssw.c:590
    assert "cigar: 9M1I5M" in r.stdout


def test_c_sources_present_and_wellformed():
    """Always-on guard: the C surface exists and declares the reference's
    API names (ref: src/ssw.h:86-140)."""
    for f in ("ssw_client.h", "ssw_client.c", "example_c.c"):
        assert os.path.exists(os.path.join(C_SRC, f))
    hdr = open(os.path.join(C_SRC, "ssw_client.h")).read()
    for needle in ("s_profile", "s_align", "ssw_init", "ssw_align",
                   "init_destroy", "align_destroy"):
        assert needle in hdr
