"""Config-2-at-scale protein benchmark: BLOSUM50 reads vs a synthetic
proteome, pack on/off (VERDICT r3 #3 done-criterion: quirk-path packing
must improve protein reads/s measurably).

Workload matches the BENCH.md round-2/3 description: 512 reads, 30-150aa,
5% substitutions, vs a 200k-aa proteome; full pipeline (forward +
suboptimal + begins + traceback), BLOSUM50 o3/e1 (quirk on: min(mat) =
-5 < -2*gapE).  Deterministic seed.  Timing: JIT-warm second call, one
device->host transfer per phase via the pipeline's own downloads.

Usage: python tools/bench_protein.py [--reads 512] [--proteome 200000]
       [--pack {0,1,both}]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(reads, ref, mat, pack: bool):
    from ssw_tpu import pipeline

    os.environ["SSW_TPU_PACK"] = "1" if pack else "0"
    req = pipeline.BatchRequest(
        reads=reads, ref=ref, mat=mat, gapO=3, gapE=1, flag=0x0F,
        mask_len=[max(len(r) // 2, 15) for r in reads])
    t0 = time.perf_counter()
    out = pipeline.align_batch(req, "pallas")
    wall = time.perf_counter() - t0
    return out, wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=512)
    ap.add_argument("--proteome", type=int, default=200000)
    ap.add_argument("--pack", default="both", choices=("0", "1", "both"))
    args = ap.parse_args()
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jaxcache")

    import numpy as np

    from ssw_tpu.core.encoding import BLOSUM50

    rng = np.random.default_rng(2024)
    n_aa = 20  # reads over the 20 standard residues (codes 0..19)
    ref = rng.integers(0, n_aa, args.proteome).astype(np.int32)
    reads = []
    for _ in range(args.reads):
        ln = int(rng.integers(30, 151))
        off = int(rng.integers(0, args.proteome - ln))
        rd = ref[off:off + ln].copy()
        m = rng.random(ln) < 0.05
        rd[m] = rng.integers(0, n_aa, int(m.sum()))
        reads.append(rd.astype(np.int32))
    mat = np.asarray(BLOSUM50, np.int8)
    cells = float(sum(len(r) for r in reads)) * args.proteome

    modes = {"0": (False,), "1": (True,), "both": (False, True)}[args.pack]
    for pack in modes:
        run(reads, ref, mat, pack)              # compile
        outs, wall = run(reads, ref, mat, pack)  # warm
        print({
            "pack": int(pack),
            "reads": args.reads,
            "proteome": args.proteome,
            "wall_s": round(wall, 2),
            "reads_per_s": round(args.reads / wall, 1),
            "gcups": round(cells / wall / 1e9, 2),
            "score_sum": int(sum(a.score1 for a in outs)),
            "cigar_sum": int(sum(len(a.cigar or []) for a in outs)),
        }, flush=True)


if __name__ == "__main__":
    main()
