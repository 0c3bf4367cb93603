"""Multi-host sharding driver: deterministic read partitioning, output
re-assembly order, and checkpoint/resume journaling."""

import io
import os

from ssw_tpu.parallel import multihost


def test_owned_ranges_cover_and_balance():
    plan = [multihost.ShardPlan(num_hosts=3, host_id=p) for p in range(3)]
    for blen in (1, 2, 3, 7, 2048):
        ranges = [pl.owned_range(blen) for pl in plan]
        # contiguous cover of [0, blen)
        assert ranges[0][0] == 0 and ranges[-1][1] == blen
        for (a, b), (c, d) in zip(ranges, ranges[1:]):
            assert b == c
        sizes = [b - a for a, b in ranges]
        assert max(sizes) - min(sizes) <= 1


def test_batches_split_and_offsets():
    recs = list(range(10))
    out = {}
    for p in range(2):
        plan = multihost.ShardPlan(num_hosts=2, host_id=p, batch_size=4)
        for g, off, owned in plan.batches(recs):
            for i, r in enumerate(owned):
                out[off + i] = r
    assert out == {i: i for i in range(10)}


def test_run_sharded_and_merge(tmp_path):
    recs = [f"read{i}" for i in range(9)]
    shards = []
    for p in range(2):
        plan = multihost.ShardPlan(num_hosts=2, host_id=p, batch_size=4)
        shard = str(tmp_path / f"out.part{p}")
        n = multihost.run_sharded(
            recs, plan, lambda owned: [r.upper() + "\n" for r in owned],
            shard, journal_path=str(tmp_path / f"journal{p}"))
        assert n > 0
        shards.append(shard)
    buf = io.StringIO()
    total = multihost.merge_shards(shards, buf)
    assert total == 9
    assert buf.getvalue() == "".join(f"READ{i}\n" for i in range(9))


def test_resume_skips_completed_batches(tmp_path):
    recs = [f"r{i}" for i in range(8)]
    plan = multihost.ShardPlan(num_hosts=1, host_id=0, batch_size=4)
    shard = str(tmp_path / "s")
    journal = str(tmp_path / "j")
    calls = []

    def align(owned):
        calls.append(len(owned))
        if len(calls) == 2:
            raise RuntimeError("simulated crash in batch 2")
        return [r + "\n" for r in owned]

    try:
        multihost.run_sharded(recs, plan, align, shard, journal)
    except RuntimeError:
        pass
    assert calls == [4, 4]

    calls.clear()
    n = multihost.run_sharded(recs, plan,
                              lambda o: (calls.append(len(o)) or
                                         [r + "\n" for r in o]),
                              shard, journal)
    assert calls == [4]      # batch 0 skipped, only batch 1 re-run
    assert n == 4
    buf = io.StringIO()
    assert multihost.merge_shards([shard], buf) == 8
    assert buf.getvalue() == "".join(f"r{i}\n" for i in range(8))


def test_crash_between_write_and_journal_no_duplicates(tmp_path, monkeypatch):
    """Crash after a batch's lines hit the shard but before the journal
    mark: the resumed run re-appends that batch and merge must keep only
    the last copy of each index."""
    recs = [f"r{i}" for i in range(8)]
    plan = multihost.ShardPlan(num_hosts=1, host_id=0, batch_size=4)
    shard = str(tmp_path / "s")
    journal = str(tmp_path / "j")

    real_mark = multihost.Journal.mark

    def crashing_mark(self, batch, n):
        if batch == 1:
            raise RuntimeError("simulated crash after write, before mark")
        return real_mark(self, batch, n)

    monkeypatch.setattr(multihost.Journal, "mark", crashing_mark)
    try:
        multihost.run_sharded(recs, plan, lambda o: [r + "\n" for r in o],
                              shard, journal)
    except RuntimeError:
        pass
    monkeypatch.setattr(multihost.Journal, "mark", real_mark)
    multihost.run_sharded(recs, plan, lambda o: [r + "\n" for r in o],
                          shard, journal)
    buf = io.StringIO()
    assert multihost.merge_shards([shard], buf) == 8
    assert buf.getvalue() == "".join(f"r{i}\n" for i in range(8))


def test_empty_line_suppression(tmp_path):
    recs = ["a", "b"]
    plan = multihost.ShardPlan(num_hosts=1, host_id=0, batch_size=8)
    shard = str(tmp_path / "s")
    multihost.run_sharded(recs, plan, lambda o: ["A\n", ""], shard)
    buf = io.StringIO()
    assert multihost.merge_shards([shard], buf) == 2
    assert buf.getvalue() == "A\n"


def test_truncated_shard_line_on_resume(tmp_path):
    """A run killed mid-write leaves a truncated (no-newline) shard line;
    the resumed run must not concatenate onto it and merge must survive
    the orphan fragment (ADVICE round 1, medium)."""
    recs = [f"r{i}" for i in range(8)]
    plan = multihost.ShardPlan(num_hosts=1, host_id=0, batch_size=4)
    shard = str(tmp_path / "s")
    journal = str(tmp_path / "j")

    # run 1: batch 0 completes, then the process dies mid-write of batch 1
    # (journal has batch 0 only; shard ends in a truncated JSON line)
    multihost.run_sharded(recs[:4], plan,
                          lambda owned: [r + "\n" for r in owned],
                          shard, journal_path=journal)
    with open(shard, "a") as f:
        f.write('{"i": 4, "s": "r4')  # truncated, no newline

    # resumed run reprocesses batch 1 (journal says batch 0 done)
    multihost.run_sharded(recs, plan,
                          lambda owned: [r + "\n" for r in owned],
                          shard, journal_path=journal)
    buf = io.StringIO()
    total = multihost.merge_shards([shard], buf)
    assert total == 8
    assert buf.getvalue() == "".join(f"r{i}\n" for i in range(8))
