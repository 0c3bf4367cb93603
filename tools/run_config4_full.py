"""One clean, reproducible config-4 FULL run (VERDICT r2 weak #5).

The full BASELINE config-4 workload — 100,000 Illumina-like 100bp reads,
both strands, full pipeline (`-c -s -h -r`) against tests/data/1M.fa —
with the per-phase profiling table, inclusive accounting (all fixed costs
inside the wall), and a SHA-256 of the SAM body so byte-stability across
code versions is one string comparison.

Run ONLY in a verified-healthy tunnel window (tools/kernel_lab.py full
first; ~27 ms/call healthy) — sustained ~15-minute runs degrade the
tunnel, so quote the health baseline before AND after.
Ref workload: /root/reference/src/main.c:462-535 (+ README benchmark).
"""

import hashlib
import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jaxcache")
    plat = os.environ.get("SSW_TPU_PLATFORM")  # the env var JAX_PLATFORMS
    if plat:                                   # is ignored on this harness
        import jax
        jax.config.update("jax_platforms", plat)
    from ssw_tpu import cli, pipeline, profiling

    ref = os.path.join(REPO, "tests", "data", "1M.fa")
    fq = os.path.join(REPO, "bench_data", "100k_illumina1.fastq.gz")
    n_reads = int(os.environ.get("SSW_TPU_FULLRUN_READS", "100000"))
    if n_reads != 100000:
        # slice mode for shakedown runs
        import gzip
        import tempfile
        with gzip.open(fq, "rt") as f:
            lines = [f.readline() for _ in range(4 * n_reads)]
        tf = tempfile.NamedTemporaryFile("w", suffix=".fastq", delete=False)
        tf.writelines(lines)
        tf.close()
        fq = tf.name

    counter = profiling.GcupsCounter()
    out, err = io.StringIO(), io.StringIO()
    t0 = time.perf_counter()
    with pipeline.profiled(counter):
        rc = cli.main(["-c", "-s", "-h", "-r", ref, fq], out=out, err=err)
    wall = time.perf_counter() - t0
    sam = out.getvalue()
    body = "".join(l for l in sam.splitlines(keepends=True)
                   if not l.startswith("@"))
    print({
        "rc": rc,
        "reads": n_reads,
        "wall_s": round(wall, 1),
        "reads_per_s_inclusive": round(n_reads / wall, 1),
        "phases_s": {k: round(v, 1) for k, v in counter.seconds.items()},
        "gcups_forward": round(counter.gcups("forward"), 2),
        "sam_bytes": len(sam),
        "sam_body_sha256": hashlib.sha256(body.encode()).hexdigest(),
    })


if __name__ == "__main__":
    main()
