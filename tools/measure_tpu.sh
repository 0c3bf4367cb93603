#!/bin/bash
# Round measurement battery for the one-chip axon TPU.  Run serially; the
# tunnel wedges under concurrent use and degrades on sustained load —
# always health-check first and re-run anything suspicious after idle
# (see .claude/skills/verify/SKILL.md).
#
# Usage: bash tools/measure_tpu.sh [quick|full]
#   quick: health + parity spot-check + bench.py          (~5 min warm)
#   full : + e2e config-4 (8000 reads) + 10 Mbp long-target (~25 min)
set -x
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/jaxcache}
MODE=${1:-quick}

# 0. health baseline: expect ~27 ms/call, ~39 G lane-cells/s
timeout 600 python tools/kernel_lab.py full || exit 1

# 1. on-hardware parity spot-check (pallas vs scan, full pipeline)
timeout 1800 python tools/spotcheck_tpu.py || exit 1

# 2. the driver metric
timeout 900 python bench.py

[ "$MODE" = "full" ] || exit 0

# 3. e2e config-4 with per-phase table
timeout 3000 python tools/bench_suite.py --reads 8000 --skip-scaling

# 4. long-target (config-5 proxy): 1000 reads vs bench_data/10M.fa
python - <<'EOF'
import gzip
import io
import os
import resource
import sys
import tempfile
import time

sys.path.insert(0, os.getcwd())

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
cli.main(["-c", "-s", "-h", "bench_data/10M.fa", tw.name], out=warm,
         err=warm)
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
print({"rc": rc, "reads": N_READS, "records": n, "seconds": round(dt, 1),
       "reads_per_s": round(N_READS / dt, 2),
       "phases": {k: round(v, 2) for k, v in counter.seconds.items()},
       "gcups_forward": round(counter.gcups("forward"), 2),
       "peak_rss_gb": round(
           resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2)})
EOF
echo ALL DONE
