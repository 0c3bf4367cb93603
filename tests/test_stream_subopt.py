"""Streaming suboptimal scan == full-buffer suboptimal scan.

The streaming path (pipeline._second_best_streaming + the kernels'
blockmax / emit_maxcol modes) replaces the (B, R) per-column maxima with
per-block maxima plus bounded per-read window re-runs (ref: the maxColumn
scan, src/ssw.c:358-381).  It must be bit-identical to the materialized
path on every field — the exclusion-window edges, the 32767 clamp, and
the first-index tie-break are all observable in the reference's output.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from ssw_tpu import pipeline
from ssw_tpu.ops import common, pallas_sw, scan_sw, subopt


def _mk_reads(rng, ref, n_reads, lmin, lmax, sub_rate, n):
    reads = []
    R = len(ref)
    for _ in range(n_reads):
        ln = int(rng.integers(lmin, lmax))
        off = int(rng.integers(0, max(R - ln, 1)))
        rd = ref[off:off + ln].copy()
        m = rng.random(ln) < sub_rate
        rd[m] = rng.integers(0, n - 1, int(m.sum()))
        reads.append(rd.astype(np.int32))
    return reads


def _compare(req, backend):
    prev = os.environ.get("SSW_TPU_STREAM_SUBOPT")
    try:
        os.environ["SSW_TPU_STREAM_SUBOPT"] = "0"
        full = pipeline.align_batch(req, backend)
        os.environ["SSW_TPU_STREAM_SUBOPT"] = "1"
        stream = pipeline.align_batch(req, backend)
    finally:
        if prev is None:
            os.environ.pop("SSW_TPU_STREAM_SUBOPT", None)
        else:
            os.environ["SSW_TPU_STREAM_SUBOPT"] = prev
    assert len(full) == len(stream)
    for i, (a, b) in enumerate(zip(full, stream)):
        if a is None or b is None:
            assert a is None and b is None, i
            continue
        assert vars(a) == vars(b), (i, vars(a), vars(b))


def _dna_mat(match=2, mismatch=2):
    mat = np.zeros((5, 5), np.int8)
    for i in range(4):
        for j in range(4):
            mat[i, j] = match if i == j else -mismatch
    return mat


@pytest.mark.parametrize("backend", [
    "scan", pytest.param("pallas", marks=pytest.mark.nightly)])
def test_random_dna(backend):
    rng = np.random.default_rng(11)
    ref = rng.integers(0, 4, 3000).astype(np.int32)
    reads = _mk_reads(rng, ref, 24, 20, 180, 0.08, 5)
    req = pipeline.BatchRequest(
        reads=reads, ref=ref, mat=_dna_mat(), gapO=3, gapE=1, flag=0x0F,
        mask_len=[max(len(r) // 2, 15) for r in reads])
    _compare(req, backend)


@pytest.mark.parametrize("backend", [
    "scan", pytest.param("pallas", marks=pytest.mark.nightly)])
def test_tandem_repeats_ties(backend):
    """Tandem repeats put equal column maxima at many distant positions:
    the first-index tie-break and the exclusion-window edges must agree
    exactly, including winners in full blocks far from the window."""
    rng = np.random.default_rng(5)
    unit = rng.integers(0, 4, 97).astype(np.int32)
    ref = np.tile(unit, 40)  # 3880 bp, repeats across many 256-blocks
    reads = [unit.copy() for _ in range(8)]
    reads += _mk_reads(rng, ref, 8, 40, 90, 0.05, 5)
    req = pipeline.BatchRequest(
        reads=reads, ref=ref, mat=_dna_mat(), gapO=3, gapE=1, flag=0x0F,
        mask_len=[max(len(r) // 2, 15) for r in reads])
    _compare(req, backend)


def test_quirk_protein_path():
    """min(mat) < -2*gapE turns the lane-block quirk on: word-tier reads
    re-run with word geometry and the streaming splice must serve mixed
    tiers and mixed seg geometries."""
    rng = np.random.default_rng(7)
    n = 6
    mat = np.zeros((n, n), np.int8)
    for i in range(n - 1):
        for j in range(n - 1):
            mat[i, j] = 9 if i == j else -7
    ref = rng.integers(0, n - 1, 2200).astype(np.int32)
    reads = _mk_reads(rng, ref, 12, 15, 120, 0.1, n)
    req = pipeline.BatchRequest(
        reads=reads, ref=ref, mat=mat, gapO=4, gapE=1, flag=0x0F,
        mask_len=[max(len(r) // 2, 15) for r in reads])
    _compare(req, "scan")


def test_word_rerun_mixed_tiers():
    """Long high-identity reads overflow the byte tier (score+bias >= 255)
    and land on word geometry; short ones stay byte.  The streaming
    composition must use each read's final tier for both the window edge
    asymmetry and the spliced blockmax rows."""
    rng = np.random.default_rng(13)
    ref = rng.integers(0, 4, 2600).astype(np.int32)
    long_reads = _mk_reads(rng, ref, 6, 140, 200, 0.0, 5)   # overflow
    short_reads = _mk_reads(rng, ref, 6, 20, 60, 0.05, 5)
    reads = long_reads + short_reads
    req = pipeline.BatchRequest(
        reads=reads, ref=ref, mat=_dna_mat(), gapO=3, gapE=1, flag=0x0F,
        mask_len=[max(len(r) // 2, 15) for r in reads])
    _compare(req, "scan")


def test_window_at_target_edges():
    """Exclusion windows clipped at column 0 and at ref_len, and a target
    whose length is not a multiple of the block size."""
    rng = np.random.default_rng(17)
    ref = rng.integers(0, 4, 777).astype(np.int32)
    reads = [ref[:50].copy(), ref[-50:].copy(), ref[300:360].copy()]
    reads += _mk_reads(rng, ref, 5, 30, 70, 0.05, 5)
    req = pipeline.BatchRequest(
        reads=reads, ref=ref, mat=_dna_mat(), gapO=3, gapE=1, flag=0x0F,
        mask_len=[400, 400, 15] + [max(len(r) // 2, 15)
                                   for r in reads[3:]])
    _compare(req, "scan")


def test_blockmax_kernel_parity():
    """Pallas blockmax output == block-reduce of the scan path's full
    per-column maxima (interpret mode)."""
    rng = np.random.default_rng(23)
    n = 5
    mat = _dna_mat()
    mat_ext = common.extend_matrix(mat)
    ref_len = 1000  # not a multiple of 256: validity gating observable
    ref = rng.integers(0, 4, ref_len).astype(np.int32)
    Rp = common.bucket_size(ref_len, 256)
    ref_p = np.full(Rp, n, np.int32)
    ref_p[:ref_len] = ref
    read_len = rng.integers(20, 100, 8).astype(np.int32)
    reads = [rng.integers(0, 4, l).astype(np.int32) for l in read_len]
    rp = common.pad_reads(reads, 128, n)
    prof = common.build_profile(rp, read_len, mat_ext)
    geo = common.batch_geometry(read_len, 128, word=False)
    args = (jnp.asarray(prof), jnp.asarray(ref_p), jnp.asarray(read_len),
            jnp.asarray(geo.col_mask), jnp.asarray(geo.seg_id),
            jnp.asarray(geo.seg_start))
    s0, er0, ed0, mc = scan_sw.forward_shared_ref(*args, 3, 1, False)
    want_bm = scan_sw.blockmax_reduce(mc, ref_len)
    s1, er1, ed1, bm = pallas_sw.forward_shared_ref(
        *args, 3, 1, False, max_sub=2, blockmax=True, valid_len=ref_len)
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
    np.testing.assert_array_equal(np.asarray(er0), np.asarray(er1))
    np.testing.assert_array_equal(np.asarray(ed0), np.asarray(ed1))
    np.testing.assert_array_equal(np.asarray(want_bm), np.asarray(bm))


def test_perread_maxcol_parity():
    """Pallas per-read emit_maxcol == scan per-read emit_maxcol."""
    rng = np.random.default_rng(29)
    n = 5
    mat = _dna_mat()
    mat_ext = common.extend_matrix(mat)
    B, L, W = 8, 128, 512
    read_len = rng.integers(20, 100, B).astype(np.int32)
    reads = [rng.integers(0, 4, l).astype(np.int32) for l in read_len]
    rp = common.pad_reads(reads, L, n)
    prof = common.build_profile(rp, read_len, mat_ext)
    geo = common.batch_geometry(read_len, L, word=False)
    refw = rng.integers(0, 4, (B, W)).astype(np.int32)
    args = (jnp.asarray(prof), jnp.asarray(refw), jnp.asarray(read_len),
            jnp.asarray(geo.col_mask), jnp.asarray(geo.seg_id),
            jnp.asarray(geo.seg_start))
    want = scan_sw.forward_perread_ref(*args, 3, 1, False, emit_maxcol=True)
    got = pallas_sw.forward_perread_ref(*args, 3, 1, False,
                                        emit_maxcol=True)
    for w, g, name in zip(want, got, ("score", "end_ref", "end_read",
                                      "maxcol")):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g),
                                      err_msg=name)


def test_streaming_auto_threshold():
    """_use_streaming flips on exactly when the hard cap would push the
    batch below the kernel's lane sweet spot."""
    assert not pipeline._use_streaming(1 << 20, 256)   # 1 Mbp: plenty
    assert pipeline._use_streaming(10 << 20, 128)      # 10 Mbp, Illumina
