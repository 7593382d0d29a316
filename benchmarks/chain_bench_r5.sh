#!/bin/bash
set -u
cd "$(dirname "$0")/.."
# wait for the TPU suite to finish (it owns the chip)
for i in $(seq 1 400); do
    grep -qE "passed|failed|error" benchmarks/hw_logs/tpu_suite_r5.log 2>/dev/null && \
        tail -3 benchmarks/hw_logs/tpu_suite_r5.log | grep -qE "=+|passed" && break
    sleep 20
done
OUT=benchmarks/hw_logs/bench_r5_final_$(date +%H%M%S).log
echo "=== corpus ($(date +%T)) ===" | tee "$OUT"
timeout 2400 python bench.py 2>&1 | tee -a "$OUT" | tail -1
echo "=== decode-corpus ($(date +%T)) ===" | tee -a "$OUT"
timeout 1800 python bench.py --metric decode-corpus 2>&1 | tee -a "$OUT" | tail -1
echo "=== huge ($(date +%T)) ===" | tee -a "$OUT"
timeout 1800 python bench.py --metric huge 2>&1 | tee -a "$OUT" | tail -1
echo "=== done ===" >> "$OUT"
