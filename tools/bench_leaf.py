"""One-leaf wall + per-phase breakdown at the config-4 shape (2048 x 100bp
vs 1 Mbp, streaming suboptimal) — the harness for measuring pipeline
orchestration overhead (dispatch/sync cost around the forward kernel).

Usage: python tools/bench_leaf.py [R [B [read_len [reps]]]]
Prints one dict line per rep (warm) with the phase seconds from
profiling.GcupsCounter; run twice back to back for a same-shape warm wall.
"""

import os
import sys
import time

sys.path.insert(0, os.getcwd())
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jaxcache")

import numpy as np

from tools.sweep_boundaries import mk_workload


def main():
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 1048576
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    rl = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    from ssw_tpu import pipeline, profiling
    from ssw_tpu.core.encoding import dna_matrix
    mat = dna_matrix(2, 2)
    ref, reads = mk_workload(R, B, rl)
    req = pipeline.BatchRequest(
        reads=reads, ref=ref, mat=mat, gapO=3, gapE=1, flag=0x0F,
        mask_len=[max(len(r) // 2, 15) for r in reads])
    for it in range(reps):
        ctr = profiling.GcupsCounter()
        with pipeline.profiled(ctr):
            t0 = time.perf_counter()
            out = pipeline.align_batch(req, "pallas")
            wall = time.perf_counter() - t0
        phases = {k: round(v, 3) for k, v in sorted(ctr.seconds.items())}
        print({"rep": it, "wall_s": round(wall, 3),
               "reads_per_s": round(B / wall, 1), "phases": phases,
               "checksum": (int(sum(a.score1 for a in out if a is not None)),
                            int(sum(a.score2 for a in out if a is not None)),
                            int(sum(a.ref_end2 for a in out
                                    if a is not None)))}, flush=True)


if __name__ == "__main__":
    main()
