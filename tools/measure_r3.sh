#!/bin/bash
# Round-3 measurement battery (one-chip axon TPU, run serially).
#
# Usage: bash tools/measure_r3.sh [quick|full]
#   quick: health + kernel-variant matrix + bench.py ablations   (~10 min warm)
#   full : + parity spot-check + e2e config-4 (8k) + 10 Mbp long-target
#
# The tunnel wedges under concurrent use and degrades on sustained load:
# health-check first, never run two TPU processes, re-validate anything
# slow after ~10 min idle (see .claude/skills/verify/SKILL.md).
set -x
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/jaxcache}
MODE=${1:-quick}

# 0. health baseline: expect ~27 ms/call, ~39 G lane-cells/s on 'full'
timeout 900 python tools/kernel_lab.py full lanetrack gatescan r3 || exit 1

# 1. production-kernel ablations: the driver metric under each mode
#    (gate x blockmax x pack); the headline is the first row (all on)
for combo in "1 auto 1" "1 auto 0" "0 auto 1" "0 auto 0" "1 0 0" "0 0 0"; do
  set -- $combo
  GATE=$1; STREAM=$2; PACK=$3
  if [ "$STREAM" = auto ]; then unset SSW_TPU_STREAM_SUBOPT; else export SSW_TPU_STREAM_SUBOPT=$STREAM; fi
  SSW_TPU_GATESCAN=$GATE SSW_TPU_PACK=$PACK timeout 900 python bench.py \
    | sed "s/^/gate=$GATE stream=$STREAM pack=$PACK /"
done
unset SSW_TPU_STREAM_SUBOPT

[ "$MODE" = "full" ] || exit 0

# 2. on-hardware parity spot-check (incl. streaming-40k + sharded mesh)
timeout 2400 python tools/spotcheck_tpu.py || exit 1

# 3. e2e config-4 with per-phase table (8000 reads)
timeout 3000 python tools/bench_suite.py --reads 8000 --skip-scaling

# 4. long-target (config-5 proxy): 1000 reads vs bench_data/10M.fa,
#    streaming suboptimal now auto-selected for the pallas backend
python - <<'EOF'
import gzip, io, os, resource, sys, tempfile, time
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
n = sum(1 for l in out.getvalue().splitlines() if l and not l.startswith("@"))
print({"rc": rc, "reads": N_READS, "records": n, "seconds": round(dt, 1),
       "reads_per_s": round(N_READS / dt, 2),
       "phases": {k: round(v, 2) for k, v in counter.seconds.items()},
       "gcups_forward": round(counter.gcups("forward"), 2),
       "peak_rss_gb": round(
           resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2)})
EOF
echo ALL DONE
