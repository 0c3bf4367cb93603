#!/bin/bash
# Poll the axon tunnel; when a tiny op completes quickly, run the round-2
# validation + measurement batch.  Single-process, serial.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache

for i in $(seq 1 200); do
    if timeout 60 python -c "
import jax, jax.numpy as jnp, numpy as np
float(np.asarray(jnp.sum(jnp.ones((8,128)))))" > /dev/null 2>&1; then
        echo "tunnel healthy at attempt $i ($(date))"
        break
    fi
    sleep 60
done

set -x
# 1. hardware parity spot-check of the new int8/device-prep shapes
timeout 1800 python tools/spotcheck_tpu.py > /tmp/h_spotcheck.log 2>&1

# 2. kernel health + driver metric
timeout 600 python tools/kernel_lab.py full > /tmp/h_health.log 2>&1
timeout 900 python bench.py > /tmp/h_bench.log 2>&1

# 3. e2e config-4 (8000 reads) with the slim-upload pipeline
timeout 3000 python tools/bench_suite.py --reads 8000 --skip-scaling \
    > /tmp/h_e2e.log 2>&1

# 4. long-target config-5 proxy
python - <<'EOF' > /tmp/h_longtarget.log 2>&1
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
EOF
echo ALL DONE
