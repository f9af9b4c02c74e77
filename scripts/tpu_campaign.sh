#!/bin/bash
# Round-3 chip measurement campaign: run every pending TPU gate/benchmark
# in priority order, logging to /tmp/campaign/.  Designed to be kicked
# automatically by the tunnel poller the moment the axon backend answers.
set -u
cd /root/repo
OUT=/tmp/campaign
mkdir -p $OUT
echo "campaign start $(date)" | tee $OUT/status.log

run() {
  name=$1; shift
  echo "=== $name start $(date)" | tee -a $OUT/status.log
  timeout "$@" > "$OUT/$name.log" 2>&1
  rc=$?
  echo "=== $name rc=$rc $(date)" | tee -a $OUT/status.log
}

# 1. correctness gates first (cheap, catch kernel-compile issues early)
run smoke      2400 python scripts/tpu_smoke.py
# 2. headline bench (compiles the slot kernel for the flagship shape)
run bench      3600 python bench.py
# 3. configs 3-5
run bench_extra 3600 python bench_extra.py
# 4. miscompile invariant re-check (new toolchain window)
run repro      1800 python scripts/repro_v5e_bool_scatter.py
run repro_inv  2400 python scripts/repro_v5e_bool_scatter.py --invariant
# 5. reference grids + sharded ratio
run grid_small  2400 python benchmarks/suite.py --suite small --out $OUT/grid_small.csv
run grid_medium 3600 python benchmarks/suite.py --suite medium --out $OUT/grid_medium.csv
run grid_large  5400 python benchmarks/suite.py --suite large --out $OUT/grid_large.csv
run sharded    3600 python scripts/bench_sharded.py
echo "campaign done $(date)" | tee -a $OUT/status.log
