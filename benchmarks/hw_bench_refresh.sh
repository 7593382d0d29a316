#!/bin/bash
# Post-packed-upload bench refresh: wait for a HEALTHY tunnel window
# (1 MB readback < 1.5 s — degraded phases have shown 12-108 s), then
# run the bench set that the packed-upload commits changed:
#   corpus (new headline), e2e packed vs unpacked A/B, breakdown,
#   stage split (now with the packed-upload legs).
# Run detached: nohup bash benchmarks/hw_bench_refresh.sh &
set -u
cd "$(dirname "$0")/.."
mkdir -p benchmarks/hw_logs
TS=$(date +%H%M%S)
LOG=benchmarks/hw_logs/refresh_${TS}.log
log() { echo "=== $1 ($(date +%T)) ===" | tee -a "$LOG"; }

while true; do
    S=$(timeout 150 python - <<'EOF' 2>/dev/null
import time, numpy as np, jax, jax.numpy as jnp
x = (jnp.ones((512, 512), jnp.float32) * 2); x.block_until_ready()
t0 = time.time(); np.asarray(x); print(f"{time.time()-t0:.3f}")
EOF
)
    echo "[$(date +%T)] probe readback_1mb_s=${S:-TIMEOUT}" | tee -a "$LOG"
    if [ -n "${S:-}" ] && python -c "exit(0 if float('${S}') < 1.5 else 1)"; then
        break
    fi
    sleep 480
done

log "healthy window: bench corpus (headline)"
timeout 2400 python bench.py 2>&1 | tee -a "$LOG" | tail -2
log "bench e2e (packed, default)"
timeout 1200 python bench.py --metric e2e 2>&1 | tee -a "$LOG" | tail -1
log "bench e2e (packed OFF A/B)"
timeout 1200 env TPUDRACO_PACKED_UPLOAD=0 python bench.py --metric e2e \
    2>&1 | tee -a "$LOG" | tail -1
log "bench breakdown"
timeout 1200 python bench.py --breakdown 2>&1 | tee -a "$LOG" | tail -1
log "stage split (packed legs)"
timeout 1200 python benchmarks/profile_stages.py 2>&1 | tee -a "$LOG" | tail -20
log "bench huge + decode-corpus"
timeout 1800 python bench.py --metric huge 2>&1 | tee -a "$LOG" | tail -1
timeout 1800 python bench.py --metric decode-corpus 2>&1 | tee -a "$LOG" | tail -1
log "done — $LOG"
