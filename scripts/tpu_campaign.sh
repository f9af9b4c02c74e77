#!/bin/bash
# Chip measurement campaign: run every pending TPU gate/benchmark in
# priority order, logging to /tmp/campaign/.  Kick it with
# scripts/tpu_poll_and_run.sh, which waits for the axon tunnel to answer.
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

# 1. correctness gates first (cheap-ish; catch kernel-compile issues
#    early; includes the new SOFT_WEIGHTS dense-kernel variant)
run smoke      3000 python scripts/tpu_smoke.py
# 2. headline bench (slot kernel at the flagship shape — cache-warm
#    unless the slot kernel changed)
run bench      3600 python bench.py
# 3. configs 3-5 (+4b, LP) — persisted as a driver-style artifact so the
#    claims are re-checkable next round (VERDICT r4 #9): one JSON line
#    per config in BENCHX_r05.json at the repo root (commit it)
rm -f /root/repo/BENCHX_r05.json
run bench_extra 3600 python bench_extra.py all --out /root/repo/BENCHX_r05.json
# the opt-in fused LP row (throughput mode, loud-failure contract)
run bench_lp_fused 1800 python bench_extra.py lp --fused --out /root/repo/BENCHX_r05.json
# 4. SOFT_WEIGHTS kernel-vs-flat throughput (new Mosaic compile)
run bench_sw   3600 python scripts/bench_sw.py
echo "campaign done $(date)" | tee -a $OUT/status.log
