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
timeout 900 python tools/kernel_lab.py full lanetrack gatescan r3 enc r3e || exit 1

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
timeout 3000 python tools/bench_longtarget.py
echo ALL DONE
