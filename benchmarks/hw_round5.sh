#!/bin/bash
# Round-5 healthy-window capture: the packed-ON e2e that the 08:29 probe
# hiccup dropped, the breakdown, and a fresh corpus line with the new
# cold/warm routing fields.
set -u
cd "$(dirname "$0")/.."
TS=$(date +%H%M%S)
LOG=benchmarks/hw_logs/round5_${TS}.log
log() { echo "=== $1 ($(date +%T)) ===" | tee -a "$LOG"; }
log "e2e (packed ON, default)"
timeout 1200 python bench.py --metric e2e 2>&1 | tee -a "$LOG" | tail -1
log "e2e (packed OFF)"
timeout 1200 env TPUDRACO_PACKED_UPLOAD=0 python bench.py --metric e2e 2>&1 | tee -a "$LOG" | tail -1
log "breakdown"
timeout 1200 python bench.py --breakdown 2>&1 | tee -a "$LOG" | tail -1
log "corpus (new cold/warm fields)"
timeout 2400 python bench.py 2>&1 | tee -a "$LOG" | tail -1
log "done -> $LOG"
