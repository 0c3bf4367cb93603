#!/bin/bash
# Full config-4 (100k reads, -r both strands) + config-5 proxy (10M.fa)
# after the ref-cache / b_mem fixes.  Serial; ~25 min on a healthy tunnel.
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache

timeout 600 python tools/kernel_lab.py full > /tmp/r3_health.log 2>&1
grep -q "full" /tmp/r3_health.log || { echo UNHEALTHY; exit 1; }

SSW_TPU_PROFILE=1 timeout 3600 python -m ssw_tpu.cli -c -s -h -r \
    tests/data/1M.fa bench_data/100k_illumina1.fastq.gz \
    > /tmp/r3_config4.sam 2> /tmp/r3_config4.err
echo "config4 rc=$?"

bash -c 'python - <<EOF > /tmp/r3_longtarget.log 2>&1
import gzip
import io
import os
import resource
import sys
import tempfile
import time

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

warm = io.StringIO()
with tempfile.NamedTemporaryFile("w", suffix=".fastq", delete=False) as tw:
    tw.writelines(lines[: 4 * 64])
cli.main(["-c", "-s", "-h", "bench_data/10M.fa", tw.name], out=warm, err=warm)
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
EOF'
echo ALL DONE
