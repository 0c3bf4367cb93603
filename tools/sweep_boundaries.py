"""Hardware validation of the pipeline's analytic decision boundaries
(VERDICT r3 #6): STREAM_MIN_COLS (streaming vs materialized suboptimal
scan) and the pack-width choice.

Each config times pipeline.align_batch twice (the second, same-shape
call is the warm number) on the real chip.  Results feed the constants
in pipeline.py; BENCH.md records the table.

Usage:
  python tools/sweep_boundaries.py stream   # R sweep x stream {0,1}
  python tools/sweep_boundaries.py packw    # pack width {auto,1024,2048,4096}
"""

import os
import sys
import time

sys.path.insert(0, os.getcwd())
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jaxcache")

import numpy as np


def mk_workload(R, B, read_len, seed=11):
    rng = np.random.default_rng(seed)
    ref = rng.integers(0, 4, R).astype(np.int32)
    reads = []
    for i in range(B):
        if i % 2 == 0:
            off = int(rng.integers(0, R - read_len))
            rd = ref[off:off + read_len].copy()
            m = rng.random(read_len) < 0.04
            rd[m] = rng.integers(0, 4, int(m.sum()))
        else:
            rd = rng.integers(0, 4, read_len)
        reads.append(rd.astype(np.int32))
    return ref, reads


def run_once(ref, reads, mat):
    from ssw_tpu import pipeline
    req = pipeline.BatchRequest(
        reads=reads, ref=ref, mat=mat, gapO=3, gapE=1, flag=0x0F,
        mask_len=[max(len(r) // 2, 15) for r in reads])
    t0 = time.perf_counter()
    out = pipeline.align_batch(req, "pallas")
    return time.perf_counter() - t0, out


def timed(ref, reads, mat, label):
    run_once(ref, reads, mat)                 # compile + upload
    wall, out = run_once(ref, reads, mat)     # warm
    checks = (int(sum(a.score1 for a in out)),
              int(sum(a.score2 for a in out)))
    print({"cfg": label, "warm_s": round(wall, 3),
           "reads_per_s": round(len(reads) / wall, 1),
           "checksum": checks}, flush=True)
    return wall, checks


def sweep_stream():
    from ssw_tpu.core.encoding import dna_matrix
    mat = dna_matrix(2, 2)
    for R in (16384, 32768, 131072, 1048576):
        B = 2048 if R <= 131072 else 1024
        ref, reads = mk_workload(R, B, 100)
        row = {}
        for s in ("0", "1"):
            os.environ["SSW_TPU_STREAM_SUBOPT"] = s
            wall, checks = timed(ref, reads, mat, f"R={R} stream={s}")
            row[s] = (wall, checks)
        assert row["0"][1] == row["1"][1], f"mismatch at R={R}"
        print({"R": R, "stream_speedup": round(row["0"][0] / row["1"][0],
                                               3)}, flush=True)
    os.environ.pop("SSW_TPU_STREAM_SUBOPT", None)


def sweep_packw():
    from ssw_tpu import pipeline
    from ssw_tpu.core.encoding import dna_matrix
    mat = dna_matrix(2, 2)
    os.environ["SSW_TPU_STREAM_SUBOPT"] = "1"
    for rl in (100, 150, 200):
        ref, reads = mk_workload(1048576, 2048, rl)
        base = None
        for w in (0, 1024, 2048, 4096):
            pipeline.PACK_L = w
            wall, checks = timed(ref, reads, mat, f"rl={rl} packL={w or 'auto'}")
            if base is None:
                base = checks
            assert checks == base, f"mismatch rl={rl} w={w}"
    pipeline.PACK_L = 0
    os.environ.pop("SSW_TPU_STREAM_SUBOPT", None)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "stream"
    (sweep_stream if mode == "stream" else sweep_packw)()
