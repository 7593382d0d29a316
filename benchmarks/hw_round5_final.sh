#!/bin/bash
# Round-5 final hardware validation: wait for a healthy window, then run
# the FULL TPU suite on the stable tree, then the bench set. Logs:
#   benchmarks/hw_logs/final_suite.log / final_bench.log
set -u
cd "$(dirname "$0")/.."
mkdir -p benchmarks/hw_logs
while true; do
    S=$(timeout 150 python - <<'PY' 2>/dev/null
import time, numpy as np, jax, jax.numpy as jnp
x = (jnp.ones((512, 512), jnp.float32) * 2); x.block_until_ready()
t0 = time.time(); np.asarray(x); print(f"{time.time()-t0:.3f}")
PY
)
    echo "[$(date +%T)] probe readback_1mb_s=${S:-TIMEOUT}" >> benchmarks/hw_logs/final_watch.log
    if [ -n "${S:-}" ] && python -c "exit(0 if float('${S}') < 1.5 else 1)"; then
        break
    fi
    sleep 420
done
echo "[$(date +%T)] healthy - full TPU suite" >> benchmarks/hw_logs/final_watch.log
TPUDRACO_TEST_TPU=1 timeout 4800 python -m pytest tests/ -q \
    > benchmarks/hw_logs/final_suite.log 2>&1
tail -1 benchmarks/hw_logs/final_suite.log >> benchmarks/hw_logs/final_watch.log
B=benchmarks/hw_logs/final_bench.log
echo "=== corpus ($(date +%T)) ===" > "$B"
timeout 2400 python bench.py 2>&1 | tail -1 >> "$B"
echo "=== decode-corpus ===" >> "$B"
timeout 1800 python bench.py --metric decode-corpus 2>&1 | tail -1 >> "$B"
echo "=== e2e ===" >> "$B"
timeout 1200 python bench.py --metric e2e 2>&1 | tail -1 >> "$B"
echo "=== huge ===" >> "$B"
timeout 1800 python bench.py --metric huge 2>&1 | tail -1 >> "$B"
echo "=== done ($(date +%T)) ===" >> "$B"
