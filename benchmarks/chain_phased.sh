#!/bin/bash
# wait for the round5 capture to finish, then run the phased decode-normals
# experiment on the real chip
set -u
cd "$(dirname "$0")/.."
LOG=$(ls -t benchmarks/hw_logs/round5_*.log | head -1)
for i in $(seq 1 240); do
    grep -q "=== done" "$LOG" && break
    sleep 15
done
OUT=benchmarks/hw_logs/phased_$(date +%H%M%S).log
echo "[chain] running phased decode-normals on $(date +%T)" | tee "$OUT"
timeout 1800 python benchmarks/decode_normals_phased.py 2>&1 | tee -a "$OUT" | tail -1
echo "[chain] done" >> "$OUT"
