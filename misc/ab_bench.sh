#!/usr/bin/env bash
# On-chip A/B sweep of the flag-gated perf work. Run when the axon
# tunnel is live (jax.devices() responds); each config is one bench.py
# run (the persistent compile cache makes repeats cheap after the first).
#
#   bash misc/ab_bench.sh [frames]
#
# Prints one "<tag> <json>" line per config; pin the winners as defaults
# (bench.py envs + EstimatorConfig) and record in CLAUDE.md/BENCH notes.
#
# Frame count must cover warmup (max(12, 2B+4)) plus >= 2 timed chunks
# (chunk = max(2B, 8)) or bench.py reports 0.0 fps; 160 covers B <= 20.
set -u
cd "$(dirname "$0")/.."
FRAMES=${1:-160}
# the bare `python` on this image has no packages; the real interpreter
# lives in /opt/venv (override with PYTHON=...)
PY=${PYTHON:-$(command -v python)}
"$PY" -c 'import jax' 2>/dev/null || PY=/opt/venv/bin/python
run() {
  local tag=$1; shift
  local out
  out=$(env "$@" BENCH_FRAMES=$FRAMES timeout 1800 "$PY" bench.py 2>/dev/null | tail -1)
  echo "$tag $out"
}

# NOTE bench.py defaults BENCH_PIPE=1 since the r5 sweep (pipelined won
# 55-66 fps vs 46-48 sync at b12/int4, misc/ab_r05*.log) — sync rows
# below pin BENCH_PIPE=0 explicitly.
# r3-measured reference configuration
run r3-base       BENCH_DCT_BITS=8 BENCH_BATCH=12 BENCH_PIPE=0
# int4 payloads (r4 flag)
run int4          BENCH_DCT_BITS=4 BENCH_BATCH=12 BENCH_PIPE=0
# Pallas LK kernel (r5: compiles+runs on-chip after the Mosaic aligned-
# superblock fix, but LOSES to the XLA block-fetch path — see CLAUDE.md)
run pallas-lk     BENCH_DCT_BITS=4 BENCH_BATCH=12 BENCH_PALLAS_LK=1
# batch sweep, sync path
run int4-b8       BENCH_DCT_BITS=4 BENCH_BATCH=8  BENCH_PIPE=0
run int4-b16      BENCH_DCT_BITS=4 BENCH_BATCH=16 BENCH_PIPE=0
# conditional keyframe stage off (default ON; expected neutral at bench
# settings since the 1.0 s time trigger fires every 12-frame batch)
run no-cond-kf    BENCH_DCT_BITS=4 BENCH_BATCH=12 BENCH_COND_KF=0 BENCH_PIPE=0
# pipelined frontend sweep (r3 through-tunnel measurement said the relay
# serializes fetches behind in-flight programs, making pipe SLOWER —
# r5 re-measured the opposite; keep both axes for future relay changes)
run pipe-b8       BENCH_DCT_BITS=4 BENCH_BATCH=8
run pipe-b12      BENCH_DCT_BITS=4 BENCH_BATCH=12
run pipe-b16      BENCH_DCT_BITS=4 BENCH_BATCH=16
run pipe-int8     BENCH_DCT_BITS=8 BENCH_BATCH=12
# r6 knobs: scan unroll (fusion across frames; r6 interleaved A/B said
# u4 neutral / u12 loses — re-check if XLA version moves) and pyramid
# levels (each level ~0.85 ms/frame of gather overhead; ACCURACY-GATE
# any levels change on the e2e ATE before pinning)
run pipe-unroll4  BENCH_DCT_BITS=4 BENCH_BATCH=12 BENCH_UNROLL=4
run pipe-lvl3     BENCH_DCT_BITS=4 BENCH_BATCH=12 BENCH_LEVELS=3
