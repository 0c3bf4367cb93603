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
