#!/bin/bash
set -u
cd "$(dirname "$0")/.."
for i in $(seq 1 240); do
    grep -q "chain] done" "benchmarks/hw_logs/phased_093153.log" && break
    sleep 15
done
OUT=benchmarks/hw_logs/ab_upload_$(date +%H%M%S).log
timeout 900 python benchmarks/ab_upload.py 2>&1 | tee "$OUT" | tail -3
echo "[ab] done" >> "$OUT"
