#!/bin/bash
# Lightweight tunnel health sampler: every 10 min, time one real
# D2H readback (1 MB) and append to benchmarks/hw_logs/health_r4.log.
# Tells the session WHEN the link is worth benchmarking on (readback
# of 1 MB should be <0.1 s in a healthy window; degraded phases have
# shown 70+ s for 0.26 MB).
cd "$(dirname "$0")/.."
LOG=benchmarks/hw_logs/health_r4.log
while true; do
    S=$(timeout 180 python - <<'EOF' 2>/dev/null
import time, numpy as np, jax, jax.numpy as jnp
x = (jnp.ones((512, 512), jnp.float32) * 2)
x.block_until_ready()
t0 = time.time(); a = np.asarray(x); dt = time.time() - t0
print(f"readback_1mb_s={dt:.3f}")
EOF
)
    echo "[$(date +%F' '%T)] ${S:-TIMEOUT(180s)}" >> "$LOG"
    sleep 600
done
