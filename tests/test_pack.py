"""Lane-packing parity: several reads per kernel row (contiguous slots)
must be bit-identical, per read, to the unpacked scan baseline — scores,
ends, and per-block maxima (the streaming suboptimal scan's input).

The packed kernel cuts h_diag/F at slot starts and segments the lane
prefix-max by a per-slot bias; within a slot the DP sees exactly the lanes
an unpacked row would (ref: src/ssw.c:169 pads reads to whole SIMD lanes;
pad rows ride diagonals into maxColumn).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ssw_tpu.ops import common, pallas_sw, scan_sw


def _dna_mat():
    mat = np.zeros((5, 5), np.int8)
    for i in range(4):
        for j in range(4):
            mat[i, j] = 2 if i == j else -2
    return mat


def _mk_reads(seed, R, B):
    rng = np.random.default_rng(seed)
    ref = rng.integers(0, 4, R).astype(np.int32)
    read_len = rng.integers(20, 220, B).astype(np.int32)
    reads = []
    for i, l in enumerate(read_len):
        if i % 3 == 0:  # hot: embedded high-identity read (trips the gate)
            off = int(rng.integers(0, R - l))
            reads.append(ref[off:off + l].copy())
        else:
            reads.append(rng.integers(0, 4, l).astype(np.int32))
    return ref, reads, read_len


def _scan_baseline(ref, reads, read_len, word_rows, gapO, gapE,
                   mat=None, quirk=False):
    """Unpacked scan-twin outputs with per-read tier col_masks (the
    speculative mixed-tier regime the pipeline feeds the kernel).  For the
    quirk path the tier is uniform (no overflow speculation there) and the
    seg geometry follows it."""
    mat = _dna_mat() if mat is None else mat
    R = len(ref)
    L = common.bucket_size(
        common.pad_total(int(read_len.max()), word=False), 64)
    rp = common.pad_reads(reads, L, 5)
    prof = common.build_profile(rp, read_len, common.extend_matrix(mat))
    gb = common.batch_geometry(read_len, L, word=False)
    gw = common.batch_geometry(read_len, L, word=True)
    col_mask = np.where(word_rows[:, None], gw.col_mask, gb.col_mask)
    seg_geo = gw if (quirk and word_rows.all()) else gb
    out = scan_sw.forward_shared_ref(
        jnp.asarray(prof), jnp.asarray(ref), jnp.asarray(read_len),
        jnp.asarray(col_mask), jnp.asarray(seg_geo.seg_id),
        jnp.asarray(seg_geo.seg_start), gapO, gapE, quirk)
    return out[:3] + (scan_sw.blockmax_reduce(out[3], R),), rp, L


def _packed(ref, rp, read_len, word_rows, gapO, gapE, L_pack, max_slots=64,
            mat=None, quirk=False):
    mat = _dna_mat() if mat is None else mat
    slot_len = np.where(word_rows, (read_len + 7) // 8 * 8,
                        (read_len + 15) // 16 * 16).astype(np.int32)
    plan = common.pack_plan(slot_len, L_pack, max_slots=max_slots)
    pc = common.pack_codes(plan, rp, 5)
    so, sl, rl_s = common.pack_tables(plan, read_len)
    pprof = common.build_profile(pc, None, common.extend_matrix(mat))
    flat_idx = plan.row * plan.S + plan.slot
    got = pallas_sw.forward_shared_ref_packed(
        jnp.asarray(pprof), jnp.asarray(ref), so, sl, rl_s, flat_idx,
        gapO, gapE, max_sub=int(np.max(np.abs(mat))), valid_len=len(ref),
        quirk=quirk, word=bool(word_rows.all() and word_rows.size))
    return got, plan


@pytest.mark.parametrize("word", [False, True])
def test_pack_parity(word):
    R = 1024
    ref, reads, read_len = _mk_reads(7, R, 10)
    word_rows = np.full(10, word)
    want, rp, _ = _scan_baseline(ref, reads, read_len, word_rows, 3, 1)
    got, plan = _packed(ref, rp, read_len, word_rows, 3, 1, 512)
    assert plan.S > 1  # multiple reads really share rows
    for w, g, n in zip(want, got, ("score", "end_ref", "end_read",
                                   "blockmax")):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g),
                                      err_msg=n)


@pytest.mark.nightly
def test_pack_parity_mixed_tiers_and_chunks(monkeypatch):
    """Mixed byte/word rows in one packed batch (the speculative-mask
    regime) across multiple row chunks."""
    monkeypatch.setattr(pallas_sw, "OPT_LANES", 1024)  # force 2+ chunks
    R = 768
    ref, reads, read_len = _mk_reads(13, R, 20)
    read_len = np.minimum(read_len, 120)
    reads = [r[:120] for r in reads]
    word_rows = (np.arange(20) % 2) == 0
    want, rp, _ = _scan_baseline(ref, reads, read_len, word_rows, 5, 2)
    got, plan = _packed(ref, rp, read_len, word_rows, 5, 2, 128,
                        max_slots=2)
    assert plan.n_rows > 8  # more rows than one sweet-spot chunk
    for w, g, n in zip(want, got, ("score", "end_ref", "end_read",
                                   "blockmax")):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g),
                                      err_msg=n)


def test_pack_parity_gate_off(monkeypatch):
    monkeypatch.setenv("SSW_TPU_GATESCAN", "0")
    R = 512
    ref, reads, read_len = _mk_reads(23, R, 8)
    word_rows = np.zeros(8, bool)
    want, rp, _ = _scan_baseline(ref, reads, read_len, word_rows, 3, 1)
    got, _ = _packed(ref, rp, read_len, word_rows, 3, 1, 512)
    for w, g, n in zip(want, got, ("score", "end_ref", "end_read",
                                   "blockmax")):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g),
                                      err_msg=n)


def _quirk_mat():
    """DNA-alphabet matrix with the quirk observable (min < -2*gapE at
    gapE=1: an adjacent ins+del can beat the substitution it replaces)."""
    mat = np.zeros((5, 5), np.int8)
    for i in range(4):
        for j in range(4):
            mat[i, j] = 2 if i == j else -4
    return mat


@pytest.mark.parametrize("word", [False, True])
def test_pack_parity_quirk(word):
    """Round-4 quirk packing: the lane-block segmented scan rides the
    sub-slot QBUMP bias; per-read outputs must equal the unpacked scan
    baseline with quirk=True on both tiers (ref quirk E-update:
    src/ssw.c:288-299)."""
    R = 1024
    ref, reads, read_len = _mk_reads(19, R, 12)
    word_rows = np.full(12, word)
    want, rp, _ = _scan_baseline(ref, reads, read_len, word_rows, 3, 1,
                                 mat=_quirk_mat(), quirk=True)
    got, plan = _packed(ref, rp, read_len, word_rows, 3, 1, 512,
                        mat=_quirk_mat(), quirk=True)
    assert plan.S > 1
    for w, g, n in zip(want, got, ("score", "end_ref", "end_read",
                                   "blockmax")):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g),
                                      err_msg=n)


def test_pack_quirk_span_guard():
    """The QBUMP exactness guard rejects slot spans whose value range
    could cross the block bias separation."""
    rng = np.random.default_rng(5)
    R = 512
    ref = rng.integers(0, 4, R).astype(np.int32)
    reads = [rng.integers(0, 4, 200).astype(np.int32) for _ in range(4)]
    read_len = np.full(4, 200, np.int32)
    rp = common.pad_reads(reads, 256, 5)
    big = np.zeros((5, 5), np.int8)
    for i in range(4):
        for j in range(4):
            big[i, j] = 120 if i == j else -120  # span >> QBUMP
    with pytest.raises(AssertionError):
        _packed(ref, rp, read_len, np.zeros(4, bool), 3, 1, 512,
                mat=big, quirk=True)


def test_pack_plan_properties():
    rng = np.random.default_rng(3)
    slot_len = rng.integers(16, 240, 100).astype(np.int32)
    slot_len = (slot_len + 15) // 16 * 16
    plan = common.pack_plan(slot_len, 512, max_slots=8)
    assert plan.n_rows % 8 == 0
    assert plan.S <= 8
    # no slot overlaps or row overflow
    rows = {}
    for r in range(100):
        rows.setdefault(int(plan.row[r]), []).append(
            (int(plan.off[r]), int(plan.off[r] + plan.slot_len[r])))
    for spans in rows.values():
        spans.sort()
        for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
            assert a1 <= b0
        assert spans[-1][1] <= 512
    # deterministic
    plan2 = common.pack_plan(slot_len, 512, max_slots=8)
    assert np.array_equal(plan.row, plan2.row)
    assert np.array_equal(plan.off, plan2.off)
    # codes + tables agree with the plan
    rp = common.pad_reads(
        [rng.integers(0, 4, int(l)).astype(np.int32) for l in slot_len],
        256, 5)
    pc = common.pack_codes(plan, rp, 5)
    so, sl, rl = common.pack_tables(plan, slot_len)
    for r in (0, 17, 99):
        row, off, ln = int(plan.row[r]), int(plan.off[r]), int(
            plan.slot_len[r])
        assert np.array_equal(pc[row, off:off + ln], rp[r, :ln])
        assert so[row, plan.slot[r]] == off
        assert sl[row, plan.slot[r]] == ln


@pytest.mark.nightly
def test_pack_pipeline_parity(monkeypatch):
    """Full pipeline with packing on vs off (streaming forced): every
    result field identical, including word-tier rerun reads (score >= 255
    trips the byte overflow) and suboptimal/begin positions.  Nightly:
    ~90 s of interpret-mode pipeline; the default tier keeps the
    kernel-level pack/dual parity plus the pack plan properties."""
    from ssw_tpu import pipeline

    monkeypatch.setenv("SSW_TPU_STREAM_SUBOPT", "1")
    monkeypatch.setattr(pipeline, "PACK_L", 512)  # tiny batches still pack
    rng = np.random.default_rng(31)
    R = 2048
    ref = rng.integers(0, 4, R).astype(np.int32)
    reads = []
    for i in range(40):
        ln = int(rng.integers(30, 249))  # >= 127 can overflow the byte
        if i % 2 == 0:                   # tier (score + bias >= 255)
            off = int(rng.integers(0, R - ln))
            rd = ref[off:off + ln].copy()
            m = rng.random(ln) < 0.05
            rd[m] = rng.integers(0, 4, int(m.sum()))
        else:
            rd = rng.integers(0, 4, ln)
        reads.append(rd.astype(np.int32))
    req = pipeline.BatchRequest(
        reads=reads, ref=ref, mat=_dna_mat(), gapO=3, gapE=1, flag=0x0F,
        mask_len=[max(len(r) // 2, 15) for r in reads])

    monkeypatch.setenv("SSW_TPU_PACK", "0")
    base = pipeline.align_batch(req, "pallas")
    assert any(a.flag == 0 and a.score1 >= 255 for a in base)  # word tier
    monkeypatch.setenv("SSW_TPU_PACK", "1")
    # the monkeypatched PACK_L must actually trigger packing on this batch
    read_len = np.int32([len(r) for r in reads])
    assert pipeline._plan_pack(read_len, np.zeros(40, bool), 64,
                               256) is not None
    packed = pipeline.align_batch(req, "pallas")
    for i, (a, b) in enumerate(zip(base, packed)):
        assert vars(a) == vars(b), (i, vars(a), vars(b))


@pytest.mark.nightly
def test_pack_pipeline_parity_quirk(monkeypatch):
    """Full pipeline on the QUIRK path (protein-style matrix) with packing
    on vs off: every result field identical, including word-tier rerun
    reads and suboptimal/begin positions (round-4 quirk packing)."""
    from ssw_tpu import pipeline

    monkeypatch.setenv("SSW_TPU_STREAM_SUBOPT", "1")
    monkeypatch.setattr(pipeline, "PACK_L", 512)
    rng = np.random.default_rng(47)
    R = 2048
    ref = rng.integers(0, 4, R).astype(np.int32)
    reads = []
    for i in range(32):
        ln = int(rng.integers(30, 220))
        if i % 2 == 0:
            off = int(rng.integers(0, R - ln))
            rd = ref[off:off + ln].copy()
            m = rng.random(ln) < 0.07
            rd[m] = rng.integers(0, 4, int(m.sum()))
        else:
            rd = rng.integers(0, 4, ln)
        reads.append(rd.astype(np.int32))
    req = pipeline.BatchRequest(
        reads=reads, ref=ref, mat=_quirk_mat(), gapO=3, gapE=1, flag=0x0F,
        mask_len=[max(len(r) // 2, 15) for r in reads])
    assert pipeline.needs_quirk(req.mat, req.gapE)

    monkeypatch.setenv("SSW_TPU_PACK", "0")
    base = pipeline.align_batch(req, "pallas")
    assert any(a.flag == 0 and a.score1 >= 255 for a in base)  # word tier
    monkeypatch.setenv("SSW_TPU_PACK", "1")
    packed = pipeline.align_batch(req, "pallas")
    for i, (a, b) in enumerate(zip(base, packed)):
        assert vars(a) == vars(b), (i, vars(a), vars(b))


def test_dual_tier_blockmax_parity():
    """Round-4 dual-tier emission: ONE byte-mask pass returns both tiers'
    block maxima; each must equal the scan baseline run with that tier's
    col_mask (the only tier-dependent observable when the quirk is off is
    maxColumn's pad-row inclusion).  Covers unpacked and packed."""
    R = 1024
    ref, reads, read_len = _mk_reads(53, R, 10)
    rp = common.pad_reads(reads, 256, 5)
    mat_ext = common.extend_matrix(_dna_mat())
    prof = common.build_profile(rp, read_len, mat_ext)
    gb = common.batch_geometry(read_len, 256, word=False)
    gw = common.batch_geometry(read_len, 256, word=True)

    def scan_tier(word):
        g = gw if word else gb
        out = scan_sw.forward_shared_ref(
            jnp.asarray(prof), jnp.asarray(ref), jnp.asarray(read_len),
            jnp.asarray(g.col_mask), jnp.asarray(gb.seg_id),
            jnp.asarray(gb.seg_start), 3, 1, False)
        return out[:3] + (scan_sw.blockmax_reduce(out[3], R),)

    wantB, wantW = scan_tier(False), scan_tier(True)
    got = pallas_sw.forward_shared_ref(
        jnp.asarray(prof), jnp.asarray(ref), jnp.asarray(read_len),
        jnp.asarray(gb.col_mask), jnp.asarray(gb.seg_id),
        jnp.asarray(gb.seg_start), 3, 1, False, max_sub=2, blockmax=True,
        valid_len=R, wmask=jnp.asarray(gw.col_mask.astype(np.int32)))
    for k, n in enumerate(("score", "end_ref", "end_read")):
        np.testing.assert_array_equal(np.asarray(wantB[k]),
                                      np.asarray(got[k]), err_msg=n)
    mc = np.asarray(got[3])  # (B, 2, nblk)
    np.testing.assert_array_equal(np.asarray(wantB[3]), mc[:, 0],
                                  err_msg="byte blockmax")
    np.testing.assert_array_equal(np.asarray(wantW[3]), mc[:, 1],
                                  err_msg="word blockmax")

    # packed dual: same two channels per read
    word_rows = np.zeros(10, bool)
    slot_len = ((read_len + 15) // 16 * 16).astype(np.int32)
    plan = common.pack_plan(slot_len, 512)
    pc = common.pack_codes(plan, rp, 5)
    so, sl, rl_s = common.pack_tables(plan, read_len)
    pprof = common.build_profile(pc, None, mat_ext)
    gotp = pallas_sw.forward_shared_ref_packed(
        jnp.asarray(pprof), jnp.asarray(ref), so, sl, rl_s,
        plan.row * plan.S + plan.slot, 3, 1, max_sub=2, valid_len=R,
        dual=True)
    for k, n in enumerate(("score", "end_ref", "end_read")):
        np.testing.assert_array_equal(np.asarray(wantB[k]),
                                      np.asarray(gotp[k]), err_msg=n)
    mcp = np.asarray(gotp[3])
    np.testing.assert_array_equal(np.asarray(wantB[3]), mcp[:, 0],
                                  err_msg="packed byte blockmax")
    np.testing.assert_array_equal(np.asarray(wantW[3]), mcp[:, 1],
                                  err_msg="packed word blockmax")


def test_pack_degenerate_reads():
    """Zero-length and 1-base reads: zero-length slots occupy no lanes and
    must come back as score 0 / end_ref -1 / end_read rl-1, exactly like
    the unpacked kernel."""
    rng = np.random.default_rng(41)
    R = 512
    ref = rng.integers(0, 4, R).astype(np.int32)
    reads = [np.zeros(0, np.int32), ref[10:11].copy(),
             ref[30:120].copy(), np.zeros(0, np.int32)]
    read_len = np.int32([0, 1, 90, 0])
    word_rows = np.zeros(4, bool)
    want, rp, _ = _scan_baseline(ref, reads, read_len, word_rows, 3, 1)
    got, _ = _packed(ref, rp, read_len, word_rows, 3, 1, 256)
    for w, g, n in zip(want, got, ("score", "end_ref", "end_read",
                                   "blockmax")):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g),
                                      err_msg=n)


@pytest.mark.nightly
def test_pack_cli_byte_parity(monkeypatch, tmp_path):
    """Whole CLI (SAM + header + warnings) byte-identical with packing on
    vs off on a streaming-scale target — packing must be invisible in
    every emitted byte, not just per-field results."""
    import io

    from ssw_tpu import cli, pipeline

    # CPU runs the scan backend by default; force the pallas (interpret)
    # backend + streaming so the CLI really routes through the packed
    # kernel (R is kept interpret-feasible)
    monkeypatch.setattr(pipeline, "pick_backend", lambda b: "pallas")
    monkeypatch.setenv("SSW_TPU_STREAM_SUBOPT", "1")
    rng = np.random.default_rng(99)
    R = 4096
    ref = rng.integers(0, 4, R)
    bases = np.array(list("ACGT"))
    tfa = tmp_path / "t.fa"
    tfa.write_text(">t\n" + "".join(bases[ref]) + "\n")
    lines = []
    for i in range(24):
        ln = int(rng.integers(30, 200))
        if i % 2 == 0:
            off = int(rng.integers(0, R - ln))
            rd = ref[off:off + ln].copy()
            m = rng.random(ln) < 0.06
            rd[m] = rng.integers(0, 4, int(m.sum()))
        else:
            rd = rng.integers(0, 4, ln)
        lines.append(f">r{i}\n" + "".join(bases[rd]) + "\n")
    qfa = tmp_path / "q.fa"
    qfa.write_text("".join(lines))

    monkeypatch.setattr(pipeline, "PACK_L", 512)

    def run():
        out, err = io.StringIO(), io.StringIO()
        rc = cli.main(["-c", "-s", "-h", str(tfa), str(qfa)], out=out,
                      err=err)
        assert rc == 0
        stable_err = [l for l in err.getvalue().splitlines()
                      if not l.startswith("CPU time:")]
        return out.getvalue(), stable_err

    monkeypatch.setenv("SSW_TPU_PACK", "0")
    base = run()
    monkeypatch.setenv("SSW_TPU_PACK", "1")
    packed = run()
    assert base == packed


def test_plan_pack_width_sweep():
    """The planner sweeps PACK_WIDTHS when SSW_TPU_PACK_L is unset: a
    production config-4 batch (2048x100bp, byte tier) packs at a narrow
    width (less 8-row rounding waste, smaller S), a 200bp batch picks a
    wide row (a 1024 row fits only 4 x 208 slots, wasting 19% on the
    tail), and small batches reject (rounding eats the utilization win)."""
    from ssw_tpu import pipeline

    if pipeline.PACK_L:
        pytest.skip("SSW_TPU_PACK_L pinned in this environment")
    p4 = pipeline._plan_pack(np.full(2048, 100, np.int32),
                             np.zeros(2048, bool), 2048, 128)
    assert p4 is not None and p4.L == 1024 and p4.S == 9
    p200 = pipeline._plan_pack(np.full(1024, 200, np.int32),
                               np.zeros(1024, bool), 1024, 256)
    assert p200 is not None and p200.L == 4096
    assert pipeline._plan_pack(np.full(256, 100, np.int32),
                               np.zeros(256, bool), 256, 128) is None
    # pinning a width restricts the sweep to it
    old = pipeline.PACK_L
    try:
        pipeline.PACK_L = 2048
        pinned = pipeline._plan_pack(np.full(2048, 100, np.int32),
                                     np.zeros(2048, bool), 2048, 128)
        assert pinned is not None and pinned.L == 2048
    finally:
        pipeline.PACK_L = old
