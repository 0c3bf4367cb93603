#!/bin/bash
# Consolidated round-2 TPU measurement batch (run serially; the axon tunnel
# wedges under concurrent/heavy use).  Results land in /tmp/r2_*.log.
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache

# 0. health baseline (expect ~27 ms/call): abort early if degraded
timeout 600 python tools/kernel_lab.py full > /tmp/r2_health.log 2>&1
grep -q "full" /tmp/r2_health.log || { echo UNHEALTHY; exit 1; }

# 1. op-trim candidate (biased-domain precompute)
timeout 900 python tools/kernel_lab.py full biased > /tmp/r2_biased.log 2>&1

# 2. steady-state e2e config-4 + per-phase table
timeout 3000 python tools/bench_suite.py --reads 8000 --skip-scaling \
    > /tmp/r2_e2e.log 2>&1

# 3. config-5 proxy: long-target (10M.fa) single-chip CLI with MAXCOL
#    budget splitting; reads/s + peak RSS
python - <<'EOF' > /tmp/r2_longtarget.log 2>&1
import gzip
import io
import os
import resource
import tempfile
import time

import sys
sys.path.insert(0, "/root/repo")

N_READS = 1000
lines = []
with gzip.open("bench_data/100k_illumina1.fastq.gz", "rt") as f:
    for _ in range(N_READS * 4):
        lines.append(f.readline())
with tempfile.NamedTemporaryFile("w", suffix=".fastq", delete=False) as tf:
    tf.writelines(lines)
    path = tf.name

from ssw_tpu import cli, pipeline, profiling

# warm-up slice (compile)
warm = io.StringIO()
with tempfile.NamedTemporaryFile("w", suffix=".fastq", delete=False) as tw:
    tw.writelines(lines[: 4 * 64])
cli.main(["-c", "-s", "-h", "bench_data/10M.fa", tw.name],
         out=warm, err=warm)
os.unlink(tw.name)

counter = profiling.GcupsCounter()
out, err = io.StringIO(), io.StringIO()
t0 = time.perf_counter()
with pipeline.profiled(counter):
    rc = cli.main(["-c", "-s", "-h", "bench_data/10M.fa", path], out=out,
                  err=err)
dt = time.perf_counter() - t0
os.unlink(path)
n = sum(1 for l in out.getvalue().splitlines()
        if l and not l.startswith("@"))
rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
print({"rc": rc, "reads": N_READS, "records": n,
       "seconds": round(dt, 1), "reads_per_s": round(N_READS / dt, 2),
       "phases": {k: round(v, 2) for k, v in counter.seconds.items()},
       "gcups_forward": round(counter.gcups("forward"), 2),
       "peak_rss_gb": round(rss_gb, 2)})
EOF

# 4. the driver metric
timeout 900 python bench.py > /tmp/r2_bench.log 2>&1
echo ALL DONE
