"""The reference's headline workload (README.md:66-72): 1000 Ion
Torrent-like reads (25-540bp, most ~200bp) vs a 4.9 Mbp genome, default
penalties, full CLI with -c -s -h.  Reference: ~880 s (AMD) / ~960 s
(Intel) single core.  Reports cold (first same-shape call in the
process: compile-cache load + device target upload) and warm
separately, asserting byte-stable SAM across runs; the ~161 s round-2
number was a process-level run with a warm disk cache (closest to the
`cold` row here)."""

import io
import os
import resource
import sys
import time

sys.path.insert(0, os.getcwd())
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jaxcache")

from ssw_tpu import cli, pipeline, profiling

N_READS = 1000
TARGET = "bench_data/ecoli_synth.fa"
READS = "bench_data/iontorrent_1k.fastq"


def one_run(label):
    counter = profiling.GcupsCounter()
    out, err = io.StringIO(), io.StringIO()
    t0 = time.perf_counter()
    with pipeline.profiled(counter):
        rc = cli.main(["-c", "-s", "-h", TARGET, READS], out=out, err=err)
    dt = time.perf_counter() - t0
    n = sum(1 for l in out.getvalue().splitlines()
            if l and not l.startswith("@"))
    print({"run": label, "rc": rc, "reads": N_READS, "records": n,
           "seconds": round(dt, 1),
           "reads_per_s": round(N_READS / dt, 2),
           "phases": {k: round(v, 2) for k, v in counter.seconds.items()},
           "gcups_forward": round(counter.gcups("forward"), 2),
           "peak_rss_gb": round(
               resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6,
               2)}, flush=True)
    return out.getvalue()


if __name__ == "__main__":
    cold = one_run("cold")
    warm = one_run("warm")
    assert cold == warm
