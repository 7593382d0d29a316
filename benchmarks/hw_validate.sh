#!/bin/bash
# One-shot hardware validation of the round-3 pending items (CLAUDE.md):
# run when the axon tunnel is back. Each stage logs to benchmarks/hw_logs/.
#
#   bash benchmarks/hw_validate.sh          # stages 1-3 (~15 min warm)
#   bash benchmarks/hw_validate.sh suite    # + the full TPU test suite (~25 min)
#
# Stages:
#  1. ab_lane_chunk.py  — DEVICE_TABLES x LANE_CHUNK matrix, interleaved,
#                         byte-checked (tune/disable losers afterwards)
#  2. bench.py          — e2e metric, then --breakdown (link occupancy),
#                         then --metric all
#  3. bench_mixed.py    — mixed-corpus routing ratios (host/device/auto)
#  4. (opt) TPU suite   — TPUDRACO_TEST_TPU=1 pytest
set -u
cd "$(dirname "$0")/.."
mkdir -p benchmarks/hw_logs
TS=$(date +%H%M%S)
log() { echo "=== $1 ($(date +%T)) ==="; }

log "liveness probe"
timeout 120 python -c "import jax; print(jax.devices())" \
    2>&1 | tail -1 || { echo "TUNNEL STILL DEAD"; exit 1; }

log "stage 1: ab_lane_chunk matrix (DEVICE_TABLES x LANE_CHUNK x WORDS_COMPACT)"
timeout 1800 python benchmarks/ab_lane_chunk.py \
    2>&1 | tee benchmarks/hw_logs/ab_${TS}.log | tail -24

log "stage 1b: words-path profile (gather/core/sort shares, marks vs sort)"
timeout 1200 python benchmarks/profile_words.py \
    2>&1 | tee benchmarks/hw_logs/words_${TS}.log | tail -8

log "stage 2: bench corpus (production auto-routed headline)"
timeout 1800 python bench.py 2>&1 | tee benchmarks/hw_logs/corpus_${TS}.log | tail -2
log "stage 2: bench e2e (device batch only)"
timeout 1200 python bench.py --metric e2e \
    2>&1 | tee benchmarks/hw_logs/e2e_${TS}.log | tail -2
log "stage 2: bench e2e, packed upload OFF (A/B: u16 vs 12-bit upload)"
timeout 1200 env TPUDRACO_PACKED_UPLOAD=0 python bench.py --metric e2e \
    2>&1 | tee benchmarks/hw_logs/e2e_nopack_${TS}.log | tail -2
log "stage 2: bench breakdown"
timeout 1200 python bench.py --breakdown \
    2>&1 | tee benchmarks/hw_logs/brk_${TS}.log | tail -2
log "stage 2: bench all"
timeout 1800 python bench.py --metric all \
    2>&1 | tee benchmarks/hw_logs/all_${TS}.log | tail -4

log "stage 2b: e2e stage split (upload/step/flip/normalize/combo/scan/payload)"
timeout 1200 python benchmarks/profile_stages.py \
    2>&1 | tee benchmarks/hw_logs/stages_${TS}.log | tail -16

log "stage 3: mixed-corpus routing"
timeout 2400 python benchmarks/bench_mixed.py \
    2>&1 | tee benchmarks/hw_logs/mixed_${TS}.log | tail -10

if [ "${1:-}" = "suite" ]; then
    log "stage 4: TPU test suite"
    TPUDRACO_TEST_TPU=1 timeout 3600 python -m pytest tests/ -q \
        2>&1 | tee benchmarks/hw_logs/suite_${TS}.log | tail -3
fi
log "done — logs in benchmarks/hw_logs/"
