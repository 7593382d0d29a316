#!/bin/bash
# Chained extras behind hw_round5_final.sh: once final_bench.log reports
# done (and the window may still be healthy), capture the regression-power
# evidence rows: --breakdown (link_busy_frac etc.), the stage split, and
# the packed-upload A/B. Log: benchmarks/hw_logs/final_extras.log
set -u
cd "$(dirname "$0")/.."
mkdir -p benchmarks/hw_logs
L=benchmarks/hw_logs/final_extras.log
B=benchmarks/hw_logs/final_bench.log

while true; do
    if [ -f "$B" ] && grep -q "=== done" "$B"; then
        break
    fi
    sleep 300
done

echo "=== extras start ($(date +%T)) ===" > "$L"
# re-probe health: the bench set takes ~1h and the window may have closed
S=$(timeout 150 python - <<'PY' 2>/dev/null
import time, numpy as np, jax, jax.numpy as jnp
x = (jnp.ones((512, 512), jnp.float32) * 2); x.block_until_ready()
t0 = time.time(); np.asarray(x); print(f"{time.time()-t0:.3f}")
PY
)
echo "probe readback_1mb_s=${S:-TIMEOUT}" >> "$L"
if [ -z "${S:-}" ] || ! python -c "exit(0 if float('${S}') < 3.0 else 1)"; then
    echo "window closed - skipping extras" >> "$L"
    exit 0
fi

echo "=== e2e --breakdown ===" >> "$L"
timeout 1800 python bench.py --metric e2e --breakdown 2>&1 | tail -3 >> "$L"
echo "=== stage split ===" >> "$L"
timeout 1800 python benchmarks/profile_stages.py 2>&1 | tail -20 >> "$L"
echo "=== e2e packed OFF ===" >> "$L"
TPUDRACO_PACKED_UPLOAD=0 timeout 1200 python bench.py --metric e2e 2>&1 | tail -1 >> "$L"
echo "=== done ($(date +%T)) ===" >> "$L"
