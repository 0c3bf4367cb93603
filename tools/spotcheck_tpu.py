"""On-hardware parity spot-check: run the full pipeline on the TPU with the
Pallas backend and compare field-by-field against the portable scan backend
(which is itself reference-verified).  Exercises the forward kernel, the
word-tier rerun, the suboptimal scan, and the Pallas reverse pass."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssw_tpu import api  # noqa: E402
from ssw_tpu.core.encoding import BLOSUM50, dna_matrix  # noqa: E402


def check(tag, reads, ref, mat, gapO, gapE):
    a = api.align_batch(reads, ref, mat, gapO, gapE, backend="pallas")
    b = api.align_batch(reads, ref, mat, gapO, gapE, backend="scan")
    bad = 0
    for i, (x, y) in enumerate(zip(a, b)):
        fx = (x.score1, x.score2, x.ref_begin1, x.ref_end1, x.read_begin1,
              x.read_end1, x.ref_end2, tuple(x.cigar or ()), x.flag)
        fy = (y.score1, y.score2, y.ref_begin1, y.ref_end1, y.read_begin1,
              y.read_end1, y.ref_end2, tuple(y.cigar or ()), y.flag)
        if fx != fy:
            bad += 1
            if bad <= 3:
                print(f"  MISMATCH {tag}[{i}]: pallas={fx} scan={fy}")
    print(f"{tag}: {len(a)} pairs, {bad} mismatches", flush=True)
    return bad


def check_sharded(tag, reads, ref, mat, gapO, gapE):
    """align_batch_sharded over a mesh of every local device (on the TPU
    harness: a single-chip mesh) must match the unsharded pipeline —
    including the Pallas reverse pass now plumbed through its tail."""
    import jax
    from ssw_tpu import pipeline
    from ssw_tpu.parallel.mesh import make_mesh

    req = pipeline.BatchRequest(
        reads=reads, ref=ref, mat=mat, gapO=gapO, gapE=gapE, flag=0x0F,
        mask_len=[max(len(r) // 2, 15) for r in reads])
    mesh = make_mesh(len(jax.devices()), 1)
    a = pipeline.align_batch_sharded(req, mesh)
    b = pipeline.align_batch(req)
    bad = sum(1 for x, y in zip(a, b) if vars(x) != vars(y))
    print(f"{tag}: {len(a)} pairs, {bad} mismatches", flush=True)
    return bad


def main():
    rng = np.random.default_rng(42)
    total = 0

    # DNA, default penalties, mixed overlap/random reads (incl. overflow-
    # capable long reads that trigger the word tier + reverse pass)
    ref = rng.integers(0, 4, 5000).astype(np.int32)
    reads = []
    for _ in range(96):
        ln = int(rng.integers(30, 400))
        if rng.random() < 0.7:
            s = int(rng.integers(0, len(ref) - ln))
            r = ref[s:s + ln].copy()
            idx = rng.integers(0, ln, max(1, ln // 12))
            r[idx] = rng.integers(0, 4, len(idx))
            reads.append(r)
        else:
            reads.append(rng.integers(0, 4, ln).astype(np.int32))
    total += check("dna-default", reads, ref, dna_matrix(2, 2), 3, 1)
    total += check("dna-m1x3o5e2", reads, ref, dna_matrix(1, 3), 5, 2)

    # streaming suboptimal + gatescan path: a target past
    # pipeline.STREAM_MIN_COLS makes the pallas backend take the
    # lanetrack/blockmax kernel with bounded window re-runs, while the
    # scan backend keeps the materialized (B, R) path — so this cross-
    # checks the whole streaming machinery on hardware
    big = rng.integers(0, 4, 40000).astype(np.int32)
    breads = []
    for _ in range(48):
        ln = int(rng.integers(30, 300))
        if rng.random() < 0.7:
            s = int(rng.integers(0, len(big) - ln))
            r = big[s:s + ln].copy()
            idx = rng.integers(0, ln, max(1, ln // 12))
            r[idx] = rng.integers(0, 4, len(idx))
            breads.append(r)
        else:
            breads.append(rng.integers(0, 4, ln).astype(np.int32))
    total += check("dna-streaming-40k", breads, big, dna_matrix(2, 2), 3, 1)

    # lane-packed forward (several reads per kernel row): force the pack
    # decision at this batch size so the packed kernel runs on hardware;
    # the scan backend ignores packing, so this is true cross-checking
    from ssw_tpu import pipeline
    pack_l = pipeline.PACK_L
    try:
        pipeline.PACK_L = 1024
        assert pipeline._plan_pack(
            np.array([(len(r) + 15) // 16 * 16 for r in breads],
                     np.int32),
            np.zeros(len(breads), bool), 64, 512) is not None
        total += check("dna-packed-40k", breads, big, dna_matrix(2, 2),
                       3, 1)
    finally:
        pipeline.PACK_L = pack_l

    # protein / quirk path (BLOSUM50, min(mat) = -5 < -2*gapE)
    pref = rng.integers(0, 20, 2000).astype(np.int32)
    preads = []
    for _ in range(48):
        ln = int(rng.integers(20, 150))
        if rng.random() < 0.7:
            s = int(rng.integers(0, len(pref) - ln))
            r = pref[s:s + ln].copy()
            idx = rng.integers(0, ln, max(1, ln // 10))
            r[idx] = rng.integers(0, 20, len(idx))
            preads.append(r)
        else:
            preads.append(rng.integers(0, 20, ln).astype(np.int32))
    total += check("protein-quirk", preads, pref, BLOSUM50, 3, 1)

    # sharded pipeline on a real-device mesh (single-chip on this harness)
    total += check_sharded("sharded-mesh", reads[:32], ref,
                           dna_matrix(2, 2), 3, 1)

    print("TOTAL MISMATCHES:", total)
    assert total == 0


if __name__ == "__main__":
    main()
