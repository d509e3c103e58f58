#!/usr/bin/env bash
# On-chip A/B sweep of the flag-gated r4 perf work. Run when the axon
# tunnel is live (jax.devices() responds); each config is one bench.py
# run (the persistent compile cache makes repeats cheap after the first).
#
#   bash misc/ab_bench.sh [frames]
#
# Prints one "<tag> <json>" line per config; pin the winners as defaults
# (bench.py envs + EstimatorConfig) and record in CLAUDE.md/BENCH notes.
set -u
cd "$(dirname "$0")/.."
FRAMES=${1:-64}
run() {
  local tag=$1; shift
  local out
  out=$(env "$@" BENCH_FRAMES=$FRAMES timeout 1800 python bench.py 2>/dev/null | tail -1)
  echo "$tag $out"
}

# r3-measured reference configuration
run r3-base       BENCH_DCT_BITS=8 BENCH_BATCH=12
# r4 defaults (int4 payloads)
run int4          BENCH_DCT_BITS=4 BENCH_BATCH=12
# Pallas LK kernel
run pallas-lk     BENCH_DCT_BITS=4 BENCH_BATCH=12 BENCH_PALLAS_LK=1
# batch sweep at the smaller upload size
run int4-b8       BENCH_DCT_BITS=4 BENCH_BATCH=8
run int4-b16      BENCH_DCT_BITS=4 BENCH_BATCH=16
run int4-b20      BENCH_DCT_BITS=4 BENCH_BATCH=20
# pipelined frontend (wins only on locally-attached TPUs)
run pipe          BENCH_DCT_BITS=4 BENCH_BATCH=12 BENCH_PIPE=1
